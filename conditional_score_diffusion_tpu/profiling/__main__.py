"""CLI entry: ``python -m conditional_score_diffusion_tpu.profiling <trace>``."""

from conditional_score_diffusion_tpu.profiling.xplane import main

if __name__ == "__main__":
    main()

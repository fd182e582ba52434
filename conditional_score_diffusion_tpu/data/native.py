"""Build/load glue for the C++ host-data-path extension + numpy fallback.

Reference-native counterpart: the reference JIT-compiles its CUDA ops at
import time (`op/upfirdn2d.py:10-16`); here the C++ extension
(`native/csdt_native.cpp`) is compiled once with the system toolchain and
cached.  Everything degrades gracefully to numpy when no compiler is
available.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "csdt_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_lock = threading.Lock()
_native = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_BUILD_DIR, f"csdt_native{ext}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include}", _SRC, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"[csdt_native] build failed ({e}); using numpy fallback", file=sys.stderr)
        return None
    return out


def load_native():
    """Load (building if needed) the extension; None on failure."""
    global _native, _tried
    with _lock:
        if _tried:
            return _native
        _tried = True
        if not os.path.isfile(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        spec = importlib.util.spec_from_file_location("csdt_native", so)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except ImportError as e:  # pragma: no cover
            print(f"[csdt_native] load failed ({e}); using numpy fallback", file=sys.stderr)
            return None
        _native = mod
        return _native


def assemble_batch(
    images: List[np.ndarray],
    up: int = 1,
    flips: Optional[np.ndarray] = None,
) -> np.ndarray:
    """uint8 HWC images -> one f32 [0,1] NHWC batch, optional per-image
    horizontal flip and integer nearest-neighbor upsample.

    Uses the GIL-released multi-threaded C++ path when available.
    """
    B = len(images)
    H, W, C = images[0].shape
    out = np.empty((B, H * up, W * up, C), dtype=np.float32)
    native = load_native()
    if native is not None:
        srcs = [np.ascontiguousarray(im) for im in images]
        native.assemble_batch(
            [s.data for s in srcs], H, W, C, up,
            flips.astype(np.uint8).tobytes() if flips is not None else None,
            out.reshape(-1).data,
        )
        return out
    # numpy fallback
    for i, im in enumerate(images):
        x = im.astype(np.float32) / 255.0
        if flips is not None and flips[i]:
            x = x[:, ::-1]
        if up > 1:
            x = x.repeat(up, axis=0).repeat(up, axis=1)
        out[i] = x
    return out


class PrefetchIterator:
    """Background-thread prefetch of host batches (depth-bounded queue).

    Overlaps batch assembly/augmentation with device steps — the TPU-native
    replacement for the reference's DataLoader worker processes.
    """

    def __init__(self, iterator, depth: int = 2):
        import queue

        self._q = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def run():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

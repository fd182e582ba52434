// csdt_native: C++ data-path kernels for the host input pipeline.
//
// Reference-native counterpart: the reference's only native code is its two
// CUDA ops (op/*.cu); its data path is Python DataLoader workers.  On TPU
// hosts the input pipeline competes with JAX dispatch for the GIL, so the
// hot host-side byte work lives here instead: uint8 -> float32 [0,1] batch
// assembly (with optional horizontal flip and nearest-neighbor upsample)
// runs in C++ with the GIL released and OS threads across cores.
//
// Built with the CPython C API (no pybind11 in this image); see
// conditional_score_diffusion_tpu/data/native.py for the build/load glue
// and the numpy fallback.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
    const uint8_t* src;    // H*W*C uint8
    float* dst;            // (H*up)*(W*up)*C float32
    int H, W, C, up;
    bool flip;             // horizontal (W-axis) flip
};

void convert_one(const Job& j) {
    const float scale = 1.0f / 255.0f;
    for (int h = 0; h < j.H; ++h) {
        for (int w = 0; w < j.W; ++w) {
            const int src_w = j.flip ? (j.W - 1 - w) : w;
            const uint8_t* s = j.src + (static_cast<size_t>(h) * j.W + src_w) * j.C;
            // write the up x up replicated block
            for (int dy = 0; dy < j.up; ++dy) {
                float* d = j.dst +
                           ((static_cast<size_t>(h) * j.up + dy) * (j.W * j.up) +
                            static_cast<size_t>(w) * j.up) * j.C;
                for (int dx = 0; dx < j.up; ++dx) {
                    for (int c = 0; c < j.C; ++c) d[dx * j.C + c] = s[c] * scale;
                }
            }
        }
    }
}

void run_jobs(std::vector<Job>& jobs) {
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    if (jobs.size() < n_threads) n_threads = static_cast<unsigned>(jobs.size());
    std::atomic<size_t> next{0};
    auto worker = [&]() {
        for (;;) {
            const size_t i = next.fetch_add(1);
            if (i >= jobs.size()) return;
            convert_one(jobs[i]);
        }
    };
    if (n_threads <= 1) {
        worker();
        return;
    }
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (unsigned t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

// assemble_batch(srcs: list[bytes-like HWC u8], H, W, C, up, flips: bytes|None,
//                out: writable f32 buffer) -> None
PyObject* assemble_batch(PyObject*, PyObject* args) {
    PyObject* srcs;
    int H, W, C, up;
    PyObject* flips_obj;
    PyObject* out_obj;
    if (!PyArg_ParseTuple(args, "OiiiiOO", &srcs, &H, &W, &C, &up, &flips_obj,
                          &out_obj))
        return nullptr;

    if (!PyList_Check(srcs)) {
        PyErr_SetString(PyExc_TypeError, "srcs must be a list");
        return nullptr;
    }
    const Py_ssize_t B = PyList_Size(srcs);

    Py_buffer out_buf;
    if (PyObject_GetBuffer(out_obj, &out_buf, PyBUF_WRITABLE) != 0) return nullptr;
    const size_t per_img =
        static_cast<size_t>(H) * up * W * up * C;
    if (static_cast<size_t>(out_buf.len) < per_img * B * sizeof(float)) {
        PyBuffer_Release(&out_buf);
        PyErr_SetString(PyExc_ValueError, "output buffer too small");
        return nullptr;
    }

    const uint8_t* flips = nullptr;
    Py_buffer flips_buf{};
    bool have_flips = false;
    if (flips_obj != Py_None) {
        if (PyObject_GetBuffer(flips_obj, &flips_buf, PyBUF_SIMPLE) != 0) {
            PyBuffer_Release(&out_buf);
            return nullptr;
        }
        flips = static_cast<const uint8_t*>(flips_buf.buf);
        have_flips = true;
    }

    std::vector<Py_buffer> src_bufs(B);
    std::vector<Job> jobs;
    jobs.reserve(B);
    bool ok = true;
    Py_ssize_t acquired = 0;
    for (Py_ssize_t i = 0; i < B; ++i) {
        if (PyObject_GetBuffer(PyList_GetItem(srcs, i), &src_bufs[i], PyBUF_SIMPLE) != 0) {
            ok = false;
            break;
        }
        ++acquired;
        if (src_bufs[i].len < static_cast<Py_ssize_t>(
                                  static_cast<size_t>(H) * W * C)) {
            PyErr_SetString(PyExc_ValueError, "source image too small");
            ok = false;
            break;
        }
        Job j;
        j.src = static_cast<const uint8_t*>(src_bufs[i].buf);
        j.dst = static_cast<float*>(out_buf.buf) + per_img * i;
        j.H = H; j.W = W; j.C = C; j.up = up;
        j.flip = have_flips && flips[i] != 0;
        jobs.push_back(j);
    }

    if (ok) {
        Py_BEGIN_ALLOW_THREADS
        run_jobs(jobs);
        Py_END_ALLOW_THREADS
    }

    for (Py_ssize_t i = 0; i < acquired; ++i) PyBuffer_Release(&src_bufs[i]);
    if (have_flips) PyBuffer_Release(&flips_buf);
    PyBuffer_Release(&out_buf);
    if (!ok) return nullptr;
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"assemble_batch", assemble_batch, METH_VARARGS,
     "Convert a list of HWC uint8 images to one f32 [0,1] NHWC batch "
     "(optional per-image horizontal flip and integer NN upsample); GIL "
     "released, multi-threaded."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "csdt_native",
    "C++ host-side data-path kernels for conditional_score_diffusion_tpu",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_csdt_native() { return PyModule_Create(&module); }

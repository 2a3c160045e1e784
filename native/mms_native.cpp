// Native host data path: threaded pixel-batch sampling and frame collation.
//
// TPU-native counterpart of the reference's host-side data plumbing — the
// threaded CacheDataloader fan-out (reference src/data/dataloaders.py:137-162)
// and UniformPixelSampler gather (src/cameras/pixel_samplers.py:71-89). The
// device-cache path samples on-TPU; this extension serves the host path
// (datasets too large for HBM) where Python-loop gathers become the
// bottleneck at production frame counts.
//
// Built as a plain CPython extension (no pybind11): see native/setup.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

struct BufView {
  Py_buffer view{};
  bool ok = false;
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, int flags) {
    if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
    ok = true;
    return true;
  }
};

// sample_pixels(images[F,H,W,C] float32 C-contig, mosaick[H,W] int8 or None,
//               n, seed, threads) ->
//   (frame_idx bytes[int32 n], coords bytes[float32 n*2],
//    pixels bytes[float32 n*C], channels bytes[int32 n])
PyObject* sample_pixels(PyObject*, PyObject* args) {
  PyObject* images_obj;
  PyObject* mosaick_obj;
  Py_ssize_t n;
  unsigned long long seed;
  int n_threads;
  double pixel_offset;
  if (!PyArg_ParseTuple(args, "OOnKid", &images_obj, &mosaick_obj, &n, &seed,
                        &n_threads, &pixel_offset))
    return nullptr;

  BufView images;
  if (!images.acquire(images_obj, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT)) return nullptr;
  if (images.view.ndim != 4 || images.view.itemsize != 4) {
    PyErr_SetString(PyExc_ValueError, "images must be float32 [F,H,W,C] C-contiguous");
    return nullptr;
  }
  const auto* img = static_cast<const float*>(images.view.buf);
  const Py_ssize_t F = images.view.shape[0], H = images.view.shape[1],
                   W = images.view.shape[2], C = images.view.shape[3];

  const int8_t* mosaick = nullptr;
  BufView mview;
  if (mosaick_obj != Py_None) {
    if (!mview.acquire(mosaick_obj, PyBUF_C_CONTIGUOUS)) return nullptr;
    if (mview.view.ndim != 2 || mview.view.itemsize != 1) {
      PyErr_SetString(PyExc_ValueError, "mosaick mask must be int8 [H,W]");
      return nullptr;
    }
    mosaick = static_cast<const int8_t*>(mview.view.buf);
  }

  PyObject* fi_b = PyBytes_FromStringAndSize(nullptr, n * sizeof(int32_t));
  PyObject* co_b = PyBytes_FromStringAndSize(nullptr, n * 2 * sizeof(float));
  PyObject* px_b = PyBytes_FromStringAndSize(nullptr, n * C * sizeof(float));
  PyObject* ch_b = PyBytes_FromStringAndSize(nullptr, n * sizeof(int32_t));
  if (!fi_b || !co_b || !px_b || !ch_b) {
    Py_XDECREF(fi_b); Py_XDECREF(co_b); Py_XDECREF(px_b); Py_XDECREF(ch_b);
    return nullptr;
  }
  auto* fi = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(fi_b));
  auto* co = reinterpret_cast<float*>(PyBytes_AS_STRING(co_b));
  auto* px = reinterpret_cast<float*>(PyBytes_AS_STRING(px_b));
  auto* ch = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(ch_b));

  Py_BEGIN_ALLOW_THREADS
  int workers = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> pool;
  Py_ssize_t chunk = (n + workers - 1) / workers;
  for (int t = 0; t < workers; ++t) {
    Py_ssize_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      std::mt19937_64 rng(seed + 0x9e3779b97f4a7c15ULL * (t + 1));
      std::uniform_int_distribution<int64_t> df(0, F - 1), dy(0, H - 1), dx(0, W - 1);
      for (Py_ssize_t i = lo; i < hi; ++i) {
        int64_t f = df(rng), y = dy(rng), x = dx(rng);
        fi[i] = static_cast<int32_t>(f);
        co[i * 2 + 0] = static_cast<float>(y) + static_cast<float>(pixel_offset);
        co[i * 2 + 1] = static_cast<float>(x) + static_cast<float>(pixel_offset);
        std::memcpy(px + i * C, img + ((f * H + y) * W + x) * C, C * sizeof(float));
        ch[i] = mosaick ? static_cast<int32_t>(mosaick[y * W + x]) : 0;
      }
    });
  }
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS

  PyObject* out = PyTuple_Pack(4, fi_b, co_b, px_b, ch_b);
  Py_DECREF(fi_b); Py_DECREF(co_b); Py_DECREF(px_b); Py_DECREF(ch_b);
  return out;
}

// normalize_u16(frames bytes/buffer uint16 [n]) -> bytes float32 [n] (x/65535)
PyObject* normalize_u16(PyObject*, PyObject* args) {
  PyObject* src_obj;
  int n_threads;
  if (!PyArg_ParseTuple(args, "Oi", &src_obj, &n_threads)) return nullptr;
  BufView src;
  if (!src.acquire(src_obj, PyBUF_C_CONTIGUOUS)) return nullptr;
  const Py_ssize_t n = src.view.len / 2;
  const auto* in = static_cast<const uint16_t*>(src.view.buf);
  PyObject* out_b = PyBytes_FromStringAndSize(nullptr, n * sizeof(float));
  if (!out_b) return nullptr;
  auto* out = reinterpret_cast<float*>(PyBytes_AS_STRING(out_b));

  Py_BEGIN_ALLOW_THREADS
  int workers = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> pool;
  Py_ssize_t chunk = (n + workers - 1) / workers;
  constexpr float kInv = 1.0f / 65535.0f;
  for (int t = 0; t < workers; ++t) {
    Py_ssize_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (Py_ssize_t i = lo; i < hi; ++i) out[i] = in[i] * kInv;
    });
  }
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS
  return out_b;
}

PyMethodDef kMethods[] = {
    {"sample_pixels", sample_pixels, METH_VARARGS,
     "Threaded uniform pixel-batch sampling from a cached frame stack."},
    {"normalize_u16", normalize_u16, METH_VARARGS,
     "Threaded uint16 -> float32 [0,1] frame normalization."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_mms_native",
                       "Native host data-path kernels for mms-tpu.", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__mms_native() { return PyModule_Create(&kModule); }

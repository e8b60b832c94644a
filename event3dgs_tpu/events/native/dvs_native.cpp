// Native DVS event-camera simulator (CPython extension).
//
// TPU-build equivalent of the reference's `dsi` module
// (Event_sensor/ICNS_extern/simu.hpp + simu_cpp.cpp — behavioral
// reimplementation, not a copy): the same ICNS pixel model as
// events/dvs_model.py, written struct-of-arrays in C++17 for fast offline
// event-stream synthesis.  Exposes the same API surface the reference call
// sites use (SURVEY §2.3): initSimu, initLatency, initContrast, initNoise,
// initImg, updateImg, getShape, getCurv, masterRst, disableNoise, setDebug.
//
// Differences by design:
//  - a single explicit RNG (std::mt19937_64) seeded via initSimu's optional
//    third argument → reproducible runs;
//  - updateImg returns four NumPy-free Python lists packed into a dict
//    {"ts","x","y","p"} (the wrapper converts to numpy) to avoid a
//    compile-time NumPy C-API dependency.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <random>
#include <vector>

namespace {

struct Ev {
  uint64_t ts;
  uint16_t x, y;
  uint8_t p;
};

struct Simu {
  int w = 0, h = 0;  // image width (x) and height (y)
  double time = 0.0;
  // per-pixel state (row-major, index = y * w + x)
  std::vector<double> last_v, cur_v, tau_p, th_pos, th_neg;
  std::vector<double> time_px, cur_ref;  // cur_ref = +inf when open
  // parameters
  double m_th_pos = 0.3, m_th_neg = 0.3, m_th_noise = 0.0;
  double lat = 100.0, jit = 0.0, ref = 100.0, tau = 300.0;
  // background noise: per-pixel next event time (+inf = disabled) and CDFs
  std::vector<double> bgn_pos_next, bgn_neg_next;
  std::vector<double> hist_pos, hist_neg;  // n_px * 72
  std::vector<double> periods;             // 72 candidate periods
  bool noise_on = false;
  bool debug = false;
  std::mt19937_64 rng{12345};

  void resize(int W, int H) {
    w = W;
    h = H;
    size_t n = static_cast<size_t>(w) * h;
    last_v.assign(n, 0.0);
    cur_v.assign(n, 0.0);
    tau_p.assign(n, tau);
    th_pos.assign(n, m_th_pos);
    th_neg.assign(n, -m_th_neg);
    time_px.assign(n, 0.0);
    cur_ref.assign(n, inf());
    bgn_pos_next.assign(n, inf());
    bgn_neg_next.assign(n, inf());
    periods.resize(72);
    for (int i = -3; i < 5; i++)
      for (int j = 1; j < 10; j++)
        periods[(i + 3) * 9 + j - 1] = 1e6 / (j * std::pow(10.0, i));
  }

  static double inf() { return std::numeric_limits<double>::infinity(); }

  double normal(double mean, double sigma) {
    if (sigma <= 0.0) return mean;
    std::normal_distribution<double> d(mean, sigma);
    return d(rng);
  }

  double uniform() {
    std::uniform_real_distribution<double> d(0.0, 1.0);
    return d(rng);
  }

  void resample_th(size_t i, bool pos) {
    if (pos)
      th_pos[i] = std::max(0.0, normal(m_th_pos, m_th_noise));
    else
      th_neg[i] = std::min(0.0, normal(-m_th_neg, m_th_noise));
  }

  double draw_noise_wait(const std::vector<double>& hist, size_t i) {
    double prob = uniform();
    for (int j = 0; j < 72; j++)
      if (hist[i * 72 + j] >= prob) return periods[j];
    return inf();
  }

  void set_thresholds(double tp, double tn, double tnoise) {
    m_th_pos = tp;
    m_th_neg = tn;
    m_th_noise = tnoise;
    for (size_t i = 0; i < th_pos.size(); i++) {
      resample_th(i, true);
      resample_th(i, false);
    }
  }

  void init_noise(const std::vector<double>& hp, const std::vector<double>& hn,
                  long n_samples) {
    size_t n = static_cast<size_t>(w) * h;
    hist_pos.resize(n * 72);
    hist_neg.resize(n * 72);
    std::uniform_int_distribution<long> pick(0, n_samples - 1);
    for (size_t i = 0; i < n; i++) {
      long s = pick(rng);
      std::copy_n(hp.begin() + s * 72, 72, hist_pos.begin() + i * 72);
      std::copy_n(hn.begin() + s * 72, 72, hist_neg.begin() + i * 72);
      bgn_pos_next[i] = draw_noise_wait(hist_pos, i) * uniform();
      bgn_neg_next[i] = draw_noise_wait(hist_neg, i) * uniform();
    }
    noise_on = true;
  }

  void disable_noise() {
    std::fill(bgn_pos_next.begin(), bgn_pos_next.end(), inf());
    std::fill(bgn_neg_next.begin(), bgn_neg_next.end(), inf());
    noise_on = false;
  }

  void init_img(const std::vector<double>& img) {
    time = 0.0;
    size_t n = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < n; i++) {
      if (img[i] > 0) {
        double lv = std::log(img[i]);
        last_v[i] = cur_v[i] = lv;
        time_px[i] = 0.0;
        cur_ref[i] = inf();
      }
    }
  }

  void master_rst() {
    size_t n = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < n; i++) {
      last_v[i] = cur_v[i];
      cur_ref[i] = inf();
    }
  }

  // advance pixel i's filter to absolute time t toward img_l; when
  // sync_last, this is a refractory release (resets the event level)
  void lowpass_to(size_t i, double t, double img_l, bool sync_last) {
    double decay = 1.0 - std::exp(-std::max(t - time_px[i], 0.0) / tau_p[i]);
    double v = cur_v[i] + (img_l - cur_v[i]) * decay;
    cur_v[i] = v;
    time_px[i] = t;
    if (sync_last) {
      last_v[i] = v;
      cur_ref[i] = inf();
    }
  }

  void emit_noise(double dt, std::vector<Ev>& out) {
    if (!noise_on) return;
    double next_t = time + dt;
    size_t n = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < n; i++) {
      while (bgn_pos_next[i] < next_t) {
        out.push_back({static_cast<uint64_t>(bgn_pos_next[i]),
                       static_cast<uint16_t>(i % w),
                       static_cast<uint16_t>(i / w), 1});
        cur_ref[i] = bgn_pos_next[i];
        bgn_pos_next[i] += draw_noise_wait(hist_pos, i);
      }
      while (bgn_neg_next[i] < next_t) {
        out.push_back({static_cast<uint64_t>(bgn_neg_next[i]),
                       static_cast<uint16_t>(i % w),
                       static_cast<uint16_t>(i / w), 0});
        cur_ref[i] = bgn_neg_next[i];
        bgn_neg_next[i] += draw_noise_wait(hist_neg, i);
      }
    }
  }

  void update(const std::vector<double>& img, double dt, std::vector<Ev>& out) {
    emit_noise(dt, out);
    double t_end = time + dt;
    size_t n = static_cast<size_t>(w) * h;
    for (size_t i = 0; i < n; i++) {
      if (img[i] <= 0) continue;
      double img_l = std::log(img[i]);
      tau_p[i] = tau * std::log(255.0) / (img_l != 0.0 ? img_l : 1.0);
      if (cur_ref[i] < t_end) lowpass_to(i, cur_ref[i], img_l, true);
      double target =
          cur_v[i] + (img_l - cur_v[i]) *
                         (1.0 - std::exp(-std::max(t_end - time_px[i], 0.0) /
                                         tau_p[i]));
      int guard = 0;
      while (std::isinf(cur_ref[i]) && guard++ < 1024) {
        bool pos = target - last_v[i] > th_pos[i];
        bool neg = target - last_v[i] < th_neg[i];
        if (!pos && !neg) break;
        double th = pos ? th_pos[i] : th_neg[i];
        double delta = img_l - cur_v[i];
        double amp = (last_v[i] + th - cur_v[i]) / delta;
        double mean = lat - tau_p[i] * std::log1p(-amp);
        double sigma =
            std::sqrt(jit * jit +
                      std::pow(m_th_noise * tau_p[i] / delta, 2.0));
        double l = normal(mean, sigma);
        l = std::min(std::max(l, 0.0), 1e4);
        uint64_t t_ev = static_cast<uint64_t>(time_px[i] + l);
        out.push_back({t_ev, static_cast<uint16_t>(i % w),
                       static_cast<uint16_t>(i / w),
                       static_cast<uint8_t>(pos ? 1 : 0)});
        cur_ref[i] = static_cast<double>(t_ev) + ref;
        resample_th(i, pos);
        if (cur_ref[i] < t_end) lowpass_to(i, cur_ref[i], img_l, true);
      }
      lowpass_to(i, t_end, img_l, false);
    }
    time = t_end;
    std::stable_sort(out.begin(), out.end(),
                     [](const Ev& a, const Ev& b) { return a.ts < b.ts; });
  }
};

Simu g_simu;

bool parse_image(PyObject* obj, std::vector<double>& out, size_t expect) {
  PyObject* seq = PySequence_Fast(obj, "image must be a flat sequence");
  if (!seq) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  if (static_cast<size_t>(n) != expect) {
    Py_DECREF(seq);
    PyErr_SetString(PyExc_ValueError, "image size mismatch");
    return false;
  }
  out.resize(n);
  for (Py_ssize_t i = 0; i < n; i++) {
    out[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(seq, i));
  }
  Py_DECREF(seq);
  return !PyErr_Occurred();
}

PyObject* py_init_simu(PyObject*, PyObject* args) {
  int x, y;
  unsigned long long seed = 12345;
  if (!PyArg_ParseTuple(args, "ii|K", &x, &y, &seed)) return nullptr;
  g_simu.resize(x, y);
  g_simu.rng.seed(seed);
  Py_RETURN_NONE;
}

PyObject* py_init_latency(PyObject*, PyObject* args) {
  double lat, jit, ref, tau;
  if (!PyArg_ParseTuple(args, "dddd", &lat, &jit, &ref, &tau)) return nullptr;
  g_simu.lat = lat;
  g_simu.jit = jit;
  g_simu.ref = ref;
  g_simu.tau = tau;
  Py_RETURN_NONE;
}

PyObject* py_init_contrast(PyObject*, PyObject* args) {
  double tp, tn, tnoise;
  if (!PyArg_ParseTuple(args, "ddd", &tp, &tn, &tnoise)) return nullptr;
  g_simu.set_thresholds(tp, tn, tnoise);
  Py_RETURN_NONE;
}

PyObject* py_init_noise(PyObject*, PyObject* args) {
  PyObject *hp_obj, *hn_obj;
  long n_samples;
  if (!PyArg_ParseTuple(args, "OOl", &hp_obj, &hn_obj, &n_samples))
    return nullptr;
  std::vector<double> hp, hn;
  if (!parse_image(hp_obj, hp, static_cast<size_t>(n_samples) * 72))
    return nullptr;
  if (!parse_image(hn_obj, hn, static_cast<size_t>(n_samples) * 72))
    return nullptr;
  g_simu.init_noise(hp, hn, n_samples);
  Py_RETURN_NONE;
}

PyObject* py_init_img(PyObject*, PyObject* args) {
  PyObject* img_obj;
  if (!PyArg_ParseTuple(args, "O", &img_obj)) return nullptr;
  std::vector<double> img;
  size_t n = static_cast<size_t>(g_simu.w) * g_simu.h;
  if (!parse_image(img_obj, img, n)) return nullptr;
  g_simu.init_img(img);
  Py_RETURN_NONE;
}

PyObject* py_update_img(PyObject*, PyObject* args) {
  PyObject* img_obj;
  double dt;
  if (!PyArg_ParseTuple(args, "Od", &img_obj, &dt)) return nullptr;
  std::vector<double> img;
  size_t n = static_cast<size_t>(g_simu.w) * g_simu.h;
  if (!parse_image(img_obj, img, n)) return nullptr;
  std::vector<Ev> evs;
  g_simu.update(img, dt, evs);
  PyObject* ts = PyList_New(evs.size());
  PyObject* xs = PyList_New(evs.size());
  PyObject* ys = PyList_New(evs.size());
  PyObject* ps = PyList_New(evs.size());
  for (size_t i = 0; i < evs.size(); i++) {
    PyList_SET_ITEM(ts, i, PyLong_FromUnsignedLongLong(evs[i].ts));
    PyList_SET_ITEM(xs, i, PyLong_FromLong(evs[i].x));
    PyList_SET_ITEM(ys, i, PyLong_FromLong(evs[i].y));
    PyList_SET_ITEM(ps, i, PyLong_FromLong(evs[i].p));
  }
  PyObject* d = PyDict_New();
  PyDict_SetItemString(d, "ts", ts);
  PyDict_SetItemString(d, "x", xs);
  PyDict_SetItemString(d, "y", ys);
  PyDict_SetItemString(d, "p", ps);
  Py_DECREF(ts);
  Py_DECREF(xs);
  Py_DECREF(ys);
  Py_DECREF(ps);
  return d;
}

PyObject* py_get_shape(PyObject*, PyObject*) {
  return Py_BuildValue("(ii)", g_simu.w, g_simu.h);
}

PyObject* py_get_curv(PyObject*, PyObject*) {
  size_t n = static_cast<size_t>(g_simu.w) * g_simu.h;
  PyObject* out = PyList_New(n);
  for (size_t i = 0; i < n; i++)
    PyList_SET_ITEM(out, i, PyFloat_FromDouble(g_simu.cur_v[i]));
  return out;
}

PyObject* py_master_rst(PyObject*, PyObject*) {
  g_simu.master_rst();
  Py_RETURN_NONE;
}

PyObject* py_disable_noise(PyObject*, PyObject*) {
  g_simu.disable_noise();
  Py_RETURN_NONE;
}

PyObject* py_set_debug(PyObject*, PyObject* args) {
  int deb;
  if (!PyArg_ParseTuple(args, "i", &deb)) return nullptr;
  g_simu.debug = deb != 0;
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"initSimu", py_init_simu, METH_VARARGS,
     "initSimu(width, height, seed=12345)"},
    {"initLatency", py_init_latency, METH_VARARGS,
     "initLatency(lat, jitter, refractory, tau) [µs]"},
    {"initContrast", py_init_contrast, METH_VARARGS,
     "initContrast(th_pos, th_neg, th_noise)"},
    {"initNoise", py_init_noise, METH_VARARGS,
     "initNoise(hist_pos_flat, hist_neg_flat, n_samples)"},
    {"initImg", py_init_img, METH_VARARGS, "initImg(flat_luminance)"},
    {"updateImg", py_update_img, METH_VARARGS,
     "updateImg(flat_luminance, dt) -> {ts, x, y, p}"},
    {"getShape", py_get_shape, METH_NOARGS, "getShape() -> (w, h)"},
    {"getCurv", py_get_curv, METH_NOARGS, "getCurv() -> list of voltages"},
    {"masterRst", py_master_rst, METH_NOARGS, "global reset"},
    {"disableNoise", py_disable_noise, METH_NOARGS, "disable background noise"},
    {"setDebug", py_set_debug, METH_VARARGS, "setDebug(flag)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "dvs_native",
    "Native DVS event-camera simulator", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_dvs_native(void) { return PyModule_Create(&moduledef); }

"""ctypes bindings to the native C++ runtimes (native/*.cc).

Builds on demand with `make -C native` (g++ is in the image):
  * libint8_runtime.so — executes .brq artifacts bit-identically to the
    JAX int8 simulator (the TFLite-Micro stand-in).
  * libonnx_runtime.so — parses + executes the exported .onnx policy graph
    in float32 (the ONNX Runtime C++ stand-in, sb_rl.py:211-220)."""

import ctypes
import hashlib
import pathlib
import subprocess

import numpy as np

NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
LIB = NATIVE_DIR / "libint8_runtime.so"
ONNX_LIB = NATIVE_DIR / "libonnx_runtime.so"


def _make(lib_path, src_name):
    """Build (or rebuild) the shared library from source.

    Staleness is content-based: a sidecar records the sha256 of the .cc the
    .so was built from.  mtime comparison is wrong for checked-out trees
    (git gives .so and .cc equal mtimes, so an edited source would silently
    keep executing the old binary); the .so files are build artifacts and
    are not committed."""
    src = NATIVE_DIR / src_name
    stamp = NATIVE_DIR / (lib_path.name + ".srchash")
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    if (not lib_path.exists() or not stamp.exists()
            or stamp.read_text().strip() != digest):
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True)
        stamp.write_text(digest + "\n")
    return lib_path


def _ensure_built():
    return _make(LIB, "int8_runtime.cc")


class NativeInt8Policy:
    """Runs the quantized policy through the C++ integer kernels."""

    def __init__(self, qm):
        lib = ctypes.CDLL(str(_ensure_built()))
        lib.brq_create.restype = ctypes.c_void_p
        lib.brq_create.argtypes = [
            ctypes.POINTER(ctypes.c_int8)] * 3 + [
            ctypes.POINTER(ctypes.c_int32)] * 3 + [
            ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float]
        lib.brq_invoke.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int8),
                                   ctypes.POINTER(ctypes.c_int8)]
        lib.brq_run_float.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.POINTER(ctypes.c_float)]
        lib.brq_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib

        def i8(a):
            return np.ascontiguousarray(a, np.int8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int8))

        def i32(a):
            return np.ascontiguousarray(a, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32))

        self._h = lib.brq_create(
            i8(qm.w[0]), i8(qm.w[1]), i8(qm.w[2]),
            i32(qm.b[0]), i32(qm.b[1]), i32(qm.b[2]),
            qm.in_q.scale, qm.in_q.zero_point,
            qm.out_q.scale, qm.out_q.zero_point,
            qm.w_scale[0], qm.w_scale[1], qm.w_scale[2],
            qm.act_q[0].scale, qm.act_q[1].scale)

    def invoke_int8(self, q_obs):
        q_obs = np.ascontiguousarray(q_obs, np.int8)
        out = np.zeros(2, np.int8)
        self._lib.brq_invoke(
            self._h, q_obs.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
        return out

    def run(self, obs):
        obs = np.ascontiguousarray(obs, np.float32)
        out = np.zeros(2, np.float32)
        self._lib.brq_run_float(
            self._h, obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.brq_destroy(self._h)


class _IoSpec:
    def __init__(self, name):
        self.name = name


class NativeOnnxSession:
    """InferenceSession-compatible wrapper over the C++ ONNX executor
    (native/onnx_runtime.cc).  Graph IO names come from the Python parser
    (onnx_runtime.load_model); execution is native.  Float parity with the
    numpy executor and the JAX policy is asserted in tests/test_onnx.py."""

    def __init__(self, path):
        from . import onnx_runtime as pyrt

        model = pyrt.load_model(path)
        pyrt.check_model(model)
        g = model["graph"]
        init = set(g["initializers"])
        self._input_names = [n for n in g["inputs"] if n not in init]
        self._output_names = list(g["outputs"])

        lib = ctypes.CDLL(str(_make(ONNX_LIB, "onnx_runtime.cc")))
        lib.onnx_load.restype = ctypes.c_void_p
        lib.onnx_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int]
        lib.onnx_free.argtypes = [ctypes.c_void_p]
        lib.onnx_run.restype = ctypes.c_int
        lib.onnx_run.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        self._lib = lib
        err = ctypes.create_string_buffer(256)
        self._h = lib.onnx_load(str(path).encode(), err, 256)
        if not self._h:
            raise ValueError(f"onnx_load: {err.value.decode()}")

    def get_inputs(self):
        return [_IoSpec(n) for n in self._input_names]

    def get_outputs(self):
        return [_IoSpec(n) for n in self._output_names]

    def run(self, output_names, feeds):
        obs = np.ascontiguousarray(
            list(feeds.values())[0], np.float32).reshape(-1)
        if output_names is None:
            output_names = self._output_names
        results = []
        err = ctypes.create_string_buffer(256)
        for name in output_names:
            idx = self._output_names.index(name)
            out = np.zeros(64, np.float32)
            n = self._lib.onnx_run(
                self._h, obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                obs.size, idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.size, err, 256)
            if n < 0:
                raise RuntimeError(f"onnx_run: {err.value.decode()}")
            results.append(out[:n].reshape(1, n))
        return results

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.onnx_free(self._h)

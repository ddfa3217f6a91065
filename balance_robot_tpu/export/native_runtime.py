"""ctypes binding to the native C++ int8 runtime (native/int8_runtime.cc).

Builds on demand with `make -C native` (g++ is in the image); the runtime
executes .brq artifacts bit-identically to the JAX int8 simulator."""

import ctypes
import pathlib
import subprocess

import numpy as np

NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
LIB = NATIVE_DIR / "libint8_runtime.so"


def _ensure_built():
    if not LIB.exists() or (LIB.stat().st_mtime
                            < (NATIVE_DIR / "int8_runtime.cc").stat().st_mtime):
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True)
    return LIB


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

"""ctypes binding + packers for the host-resident expert FFN
(csrc/host_moe.cpp) — the reference's CPU expert offload re-targeted at
this runtime (kt-kernel/python/experts_base.py:377-485; on the axon tunnel
weight streaming is physically impossible at ~30 MB/s, so like the
reference the routed experts COMPUTE where their weights live and only
activations cross the host/device boundary).

Host layout (cache-streaming friendly, independent of the TPU formats):
  gate_up  [E, 2N, K/2] uint8   row n = gate_n, row N+n = up_n; byte j
                                 packs codes for k=2j (lo) / k=2j+1 (hi),
                                 code = q+8 with q in [-8, 7]
  gu_scales[E, 2N, K/gs] f32
  down     [E, K, N/2]  uint8   rows over the model dim
  dn_scales[E, K, N/gs] f32
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_SO = os.path.join(_CSRC, "build", "libhost_moe.so")

_lock = threading.Lock()
_lib = None
_tried = False


def hugepage_empty(shape, dtype) -> np.ndarray:
    """Uninitialized array backed by madvise(MADV_HUGEPAGE) anonymous
    memory. First-touch on this VM's 4 KB fault path writes at ~40 MB/s;
    with transparent hugepages it is ~28x faster — which dominates the
    load time of 10s-of-GB host expert arrays. Falls back to np.empty
    when mmap/madvise are unavailable (non-Linux, tiny sizes)."""
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if size < (1 << 21):  # below one hugepage: not worth the mmap
        return np.empty(shape, dtype)
    try:
        import ctypes
        import mmap as _mmap

        buf = _mmap.mmap(-1, size)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        libc = ctypes.CDLL(None, use_errno=True)
        madv_hugepage = 14  # linux MADV_HUGEPAGE
        libc.madvise(
            ctypes.c_void_p(addr), ctypes.c_size_t(size), madv_hugepage
        )
        return np.frombuffer(buf, dtype=dtype).reshape(shape)
    except Exception:  # pragma: no cover - platform-dependent
        return np.empty(shape, dtype)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC], capture_output=True, check=True
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.kt_hostmoe_create.restype = ctypes.c_int
        lib.kt_hostmoe_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, f32p, u8p, f32p, ctypes.c_int,
        ]
        lib.kt_hostmoe_forward.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, i32p, f32p, f32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _unpack_group_split(data: np.ndarray, group_size: int) -> np.ndarray:
    """numpy inverse of formats.pack_int4: [..., K/2, N] uint8 ->
    [..., K, N] int8 codes in [-8, 7] (group-split convention)."""
    *lead, k2, n = data.shape
    k = k2 * 2
    gs = group_size or k
    g = data.reshape(*lead, k // gs, gs // 2, n)
    lo = (((g & 0xF) ^ 8).astype(np.int8)) - 8
    hi = (((g >> 4) ^ 8).astype(np.int8)) - 8
    return np.concatenate([lo, hi], axis=-2).reshape(*lead, k, n)


def _pack_rows_interleaved(codes: np.ndarray) -> np.ndarray:
    """[..., R, L] int codes in [-8, 7] -> [..., R, L/2] uint8, byte j =
    (c[2j]+8) | (c[2j+1]+8)<<4 (the host kernel's pairwise layout)."""
    *lead, r, l = codes.shape
    c = (codes.astype(np.int32) + 8).astype(np.uint8)
    c = c.reshape(*lead, r, l // 2, 2)
    return (c[..., 0] | (c[..., 1] << 4)).astype(np.uint8)


def pack_host_from_qtensor(qt) -> tuple[np.ndarray, np.ndarray]:
    """Framework int4_g QTensor [E, K(logical), N] -> (host codes
    [E, N, K/2] uint8, host scales [E, N, K/gs] f32). Lossless: the same
    integer codes and group scales, re-laid-out."""
    assert qt.kind in ("int4_g",), qt.kind
    gs = qt.group_size
    codes = _unpack_group_split(np.asarray(qt.data), gs)  # [E, K, N]
    codes = np.ascontiguousarray(codes.transpose(0, 2, 1))  # [E, N, K]
    packed = _pack_rows_interleaved(codes)
    scales = np.ascontiguousarray(
        np.asarray(qt.scales, np.float32).transpose(0, 2, 1)
    )  # [E, N, G]
    return packed, scales


class HostMoELayer:
    """One MoE layer's routed experts, resident in host RAM."""

    def __init__(
        self,
        gate_up: np.ndarray,      # [E, 2N, K/2] uint8
        gu_scales: np.ndarray,    # [E, 2N, K/gs] f32
        down: np.ndarray,         # [E, K, N/2] uint8
        dn_scales: np.ndarray,    # [E, K, N/gs] f32
        activation: str = "silu",
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("libhost_moe.so unavailable (no toolchain?)")
        e, twon, k2 = gate_up.shape
        self.E, self.N, self.K = e, twon // 2, k2 * 2
        gs_gu = self.K // gu_scales.shape[2]
        gs_dn = self.N // dn_scales.shape[2]
        # keep references so the borrowed pointers stay alive
        self._arrays = (
            np.ascontiguousarray(gate_up),
            np.ascontiguousarray(gu_scales, ),
            np.ascontiguousarray(down),
            np.ascontiguousarray(dn_scales),
        )
        act = {"silu": 0, "gelu": 1, "gelu_pytorch_tanh": 1}.get(activation, 0)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        self._h = lib.kt_hostmoe_create(
            self.E, self.K, self.N, gs_gu, gs_dn,
            self._arrays[0].ctypes.data_as(u8p),
            self._arrays[1].ctypes.data_as(f32p),
            self._arrays[2].ctypes.data_as(u8p),
            self._arrays[3].ctypes.data_as(f32p),
            act,
        )
        self._lib = lib

    @classmethod
    def from_qtensors(cls, gate_up_qt, down_qt, activation="silu"):
        """Build from the framework's device QTensors (tests / real loads).
        gate_up_qt: [E, K, 2N] logical; down_qt: [E, N, K] logical."""
        gu, gus = pack_host_from_qtensor(gate_up_qt)   # [E, 2N, K/2]
        dn, dns = pack_host_from_qtensor(down_qt)      # [E, K, N/2]
        return cls(gu, gus, dn, dns, activation)

    def forward(
        self,
        x: np.ndarray,           # [T, K] float32
        ids: np.ndarray,         # [T, topk] int32
        weights: np.ndarray,     # [T, topk] float32
    ) -> np.ndarray:
        t = x.shape[0]
        topk = ids.shape[1]
        x = np.ascontiguousarray(x, np.float32)
        ids = np.ascontiguousarray(ids, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        out = np.empty((t, self.K), np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.kt_hostmoe_forward(
            self._h, t, topk,
            x.ctypes.data_as(f32p),
            ids.ctypes.data_as(i32p),
            weights.ctypes.data_as(f32p),
            out.ctypes.data_as(f32p),
        )
        return out

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self._arrays)

# encodermap_tpu/data/xtc.py
"""XTC trajectory reading: native C++ decoder with ctypes binding.

Replaces the mdtraj XTC path the reference uses for trajectory IO
(``/root/reference/encodermap/trajinfo/load_traj.py:184``). Offsets are
scanned once (cheap, no decompression) enabling lazy frame-indexed reads —
the same lazy-loading UX as the reference's ``no_load`` backend.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

from .native.build import load_library

__all__ = ["XTCReader", "read_xtc"]


class XTCReader:
    """Lazy XTC file reader. ``reader[10:20]`` decodes only those frames."""

    def __init__(self, path: Union[str, Path]) -> None:
        self.path = str(path)
        self._lib = load_library("xdr_xtc")
        if self._lib is None:
            raise RuntimeError(
                "native XTC decoder unavailable (g++ missing?) — cannot read "
                f"{path}"
            )
        self._lib.xtc_scan.restype = ctypes.c_int
        self._lib.xtc_read_frames.restype = ctypes.c_int

        n_frames = ctypes.c_int64(0)
        n_atoms = ctypes.c_int32(0)
        # an XTC frame is >= ~60 bytes, so file_size/60 bounds the frame
        # count — one scan pass with a buffer of that size (capped at 16M
        # entries / 128 MB) instead of a count pass + an offsets pass
        size = Path(self.path).stat().st_size
        bound = size // 60 + 1
        if bound <= 16_000_000:
            buf = np.zeros(bound, np.int64)
            rc = self._lib.xtc_scan(
                self.path.encode(), ctypes.byref(n_frames),
                ctypes.byref(n_atoms),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(bound),
            )
            if rc != 0:
                raise IOError(f"xtc_scan failed with code {rc} for {path}")
            self.n_frames = int(n_frames.value)
            # a 0-frame file leaves the scan's n_atoms at its -1 sentinel;
            # propagating it would build negative array dims downstream
            self.n_atoms = max(0, int(n_atoms.value))
            self._offsets = buf[: self.n_frames].copy()
        else:
            # enormous file: count first, then record offsets exactly
            rc = self._lib.xtc_scan(
                self.path.encode(), ctypes.byref(n_frames),
                ctypes.byref(n_atoms), None, ctypes.c_int64(0),
            )
            if rc != 0:
                raise IOError(f"xtc_scan failed with code {rc} for {path}")
            self.n_frames = int(n_frames.value)
            self.n_atoms = max(0, int(n_atoms.value))
            self._offsets = np.zeros(self.n_frames, np.int64)
            rc = self._lib.xtc_scan(
                self.path.encode(), ctypes.byref(n_frames),
                ctypes.byref(n_atoms),
                self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(self.n_frames),
            )
            if rc != 0:
                raise IOError(
                    f"xtc_scan (offsets) failed with code {rc} for {path}"
                )

    def read(
        self, indices: Optional[Union[Sequence[int], slice]] = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Decode selected frames.

        Returns:
            (xyz (n, n_atoms, 3) nm, box (n, 3, 3) nm, time (n,), step (n,)).
        """
        if indices is None:
            idx = np.arange(self.n_frames)
        elif isinstance(indices, slice):
            idx = np.arange(self.n_frames)[indices]
        else:
            raw = np.asarray(indices)
            if raw.dtype == bool:
                # a boolean mask cast to int64 would read frames 0/1
                # repeatedly instead of the masked selection
                if raw.shape != (self.n_frames,):
                    raise IndexError(
                        f"boolean mask length {raw.shape} does not match "
                        f"{self.n_frames} frames"
                    )
                raw = np.where(raw)[0]
            # a scalar integer (read(5)) is a natural call — a 0-d array
            # died in len() with an obscure TypeError (wave 33)
            idx = np.atleast_1d(np.asarray(raw, np.int64))
            if len(idx) and (
                idx.min() < -self.n_frames or idx.max() >= self.n_frames
            ):
                raise IndexError(
                    f"frame index out of range for {self.n_frames}-frame "
                    f"trajectory: {indices}"
                )
            idx = np.where(idx < 0, idx + self.n_frames, idx)
        offsets = np.ascontiguousarray(self._offsets[idx])
        n = len(idx)
        xyz = np.empty((n, self.n_atoms, 3), np.float32)
        box = np.empty((n, 9), np.float32)
        time = np.empty(n, np.float32)
        step = np.empty(n, np.int32)
        rc = self._lib.xtc_read_frames(
            self.path.encode(),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n),
            ctypes.c_int32(self.n_atoms),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            box.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            time.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            step.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise IOError(f"xtc_read_frames failed with code {rc} for {self.path}")
        return xyz, box.reshape(n, 3, 3), time, step

    def __len__(self) -> int:
        return self.n_frames

    def __getitem__(self, item) -> np.ndarray:
        if isinstance(item, int):
            return self.read([item])[0][0]
        return self.read(item)[0]


def read_xtc(path: Union[str, Path]):
    """Read a whole XTC file: (xyz, box, time, step)."""
    return XTCReader(path).read()


def write_xtc(
    path: Union[str, Path],
    xyz: np.ndarray,
    box: Optional[np.ndarray] = None,
    time: Optional[np.ndarray] = None,
    steps: Optional[np.ndarray] = None,
    precision: float = 1000.0,
) -> str:
    """Write coordinates as a compressed XTC file via the native encoder.

    Args:
        xyz: ``(n_frames, n_atoms, 3)`` nm.
        box: ``(n_frames, 3, 3)`` cell vectors (defaults to zeros = vacuum).
        time: per-frame times (default: frame index).
        steps: per-frame step numbers (default: frame index).
        precision: fixed-point precision (positions rounded to 1/precision).
    """
    lib = load_library("xdr_xtc")
    if lib is None:
        raise RuntimeError("native XTC encoder unavailable (g++ missing?)")
    lib.xtc_write_frames.restype = ctypes.c_int
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    n_frames, n_atoms, _ = xyz.shape
    if n_frames == 0:
        # still (re)create the file: silently keeping a stale file at the
        # target path would masquerade as the new (empty) trajectory
        open(path, "wb").close()
        return str(path)
    if box is None:
        box = np.zeros((n_frames, 3, 3), np.float32)
    box = np.ascontiguousarray(np.asarray(box, np.float32).reshape(n_frames, 9))
    step_arr = (
        np.ascontiguousarray(np.asarray(steps, np.int32))
        if steps is not None else None
    )
    time_arr = (
        np.ascontiguousarray(np.asarray(time, np.float32))
        if time is not None else None
    )
    # the native writer indexes these per frame: a short buffer would be
    # an out-of-bounds read in C++
    for nm, arr in (("steps", step_arr), ("time", time_arr)):
        if arr is not None and arr.shape != (n_frames,):
            raise ValueError(
                f"{nm} must have shape ({n_frames},) to match xyz, "
                f"got {arr.shape}"
            )
    err_frame = ctypes.c_int64(-1)
    # one open for the whole trajectory (a per-frame append-reopen loop
    # dominated large saves)
    rc = lib.xtc_write_frames(
        str(path).encode(),
        ctypes.c_int32(n_atoms),
        ctypes.c_int64(n_frames),
        step_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        if step_arr is not None else None,
        time_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if time_arr is not None else None,
        box.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(precision),
        ctypes.byref(err_frame),
    )
    if rc == 6:
        raise ValueError(
            f"non-finite coordinates at frame {err_frame.value}; refusing "
            f"to write a corrupt XTC"
        )
    if rc != 0:
        raise IOError(
            f"xtc_write_frames failed with code {rc} at frame "
            f"{err_frame.value}"
        )
    return str(path)

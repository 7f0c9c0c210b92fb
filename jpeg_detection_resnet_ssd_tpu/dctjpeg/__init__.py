"""JPEG -> block-DCT decoding: native C++ core + numpy-facing API.

Drop-in functional replacement for the reference's two git-submodule C
extensions (SURVEY.md §2.1, `.gitmodules:1-7`):

  * `loads(buf)` / `load(path)` — the jpeg2dct contract
    (`classification_part/vgg_jpeg_keras/generators/generators.py:183`):
    returns `(dct_y, dct_cb, dct_cr)` int32 arrays of shape
    `(h_blocks, w_blocks, 64)` per component, dequantized, natural frequency
    order.  For a 224x224 4:2:0 JPEG: Y (28,28,64), Cb/Cr (14,14,64).
  * `decode_dct_image(buf_or_path, size=None)` — the jpegdecoder level-2
    contract (`localisation_part/data_generator/..._dct.py:1165-1190`):
    per-component coefficients laid out spatially in 8x8 block positions,
    stacked to an (H, W, 3) plane (requires 4:4:4 or grayscale input, as the
    reference writes temp JPEGs with `subsampling=0`).

The C++ core (`csrc/dctjpeg.cc`) is compiled on demand with g++ against the
system libjpeg and loaded via ctypes — no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "dctjpeg.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_dctjpeg.so")
_lock = threading.Lock()
_lib = None


class _DctDecoded(ctypes.Structure):
    _fields_ = [
        ("n_components", ctypes.c_int),
        ("img_height", ctypes.c_int),
        ("img_width", ctypes.c_int),
        ("h_samp", ctypes.c_int * 4),
        ("v_samp", ctypes.c_int * 4),
        ("h_blocks", ctypes.c_int * 4),
        ("w_blocks", ctypes.c_int * 4),
        ("coeffs", ctypes.POINTER(ctypes.c_int32) * 4),
        ("error", ctypes.c_char * 200),
    ]


def _build_library() -> str:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-ljpeg",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dctjpeg_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.POINTER(_DctDecoded),
        ]
        lib.dctjpeg_decode.restype = ctypes.c_int
        lib.dctjpeg_release.argtypes = [ctypes.POINTER(_DctDecoded)]
        lib.dctjpeg_release.restype = None
        lib.dctjpeg_pack.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.dctjpeg_pack.restype = ctypes.c_int
        _lib = lib
        return _lib


class JPEGDecodeError(RuntimeError):
    pass


def decode_components(buf: bytes, dequantize: bool = True):
    """Decode a JPEG buffer to a list of (h_blocks, w_blocks, 64) int32 arrays.

    Returns (components, (img_height, img_width), sampling) where sampling is
    a list of per-component (h_samp, v_samp).
    """
    lib = _get_lib()
    out = _DctDecoded()
    rc = lib.dctjpeg_decode(buf, len(buf), int(dequantize), ctypes.byref(out))
    if rc != 0:
        raise JPEGDecodeError(out.error.decode(errors="replace"))
    try:
        comps = []
        sampling = []
        for ci in range(out.n_components):
            hb, wb = out.h_blocks[ci], out.w_blocks[ci]
            arr = np.ctypeslib.as_array(out.coeffs[ci], shape=(hb, wb, 64))
            comps.append(np.array(arr, dtype=np.int32))  # copy before release
            sampling.append((out.h_samp[ci], out.v_samp[ci]))
        return comps, (out.img_height, out.img_width), sampling
    finally:
        lib.dctjpeg_release(ctypes.byref(out))


def loads(buf: bytes, normalized: bool = True):
    """jpeg2dct-compatible: bytes -> (dct_y, dct_cb, dct_cr) int32 tensors.

    `normalized=True` dequantizes (the reference pipelines always use the
    default normalized coefficients).  Grayscale JPEGs yield zero chroma at
    half the luma block resolution (4:2:0-shaped), mirroring the RGB-convert
    guard in the reference generator (`generators.py:149-151` converts all
    images to RGB before re-encoding, so 3 components is the common case).
    """
    comps, _, _ = decode_components(buf, dequantize=normalized)
    y = comps[0]
    if len(comps) >= 3:
        return y, comps[1], comps[2]
    hb = (y.shape[0] + 1) // 2
    wb = (y.shape[1] + 1) // 2
    zeros = np.zeros((hb, wb, 64), dtype=np.int32)
    return y, zeros, zeros.copy()


def load(path: str, normalized: bool = True):
    """jpeg2dct-compatible: file path -> (dct_y, dct_cb, dct_cr)."""
    with open(path, "rb") as f:
        return loads(f.read(), normalized=normalized)


def blocks_to_plane(blocks: np.ndarray) -> np.ndarray:
    """(H8, W8, 64) block tensor -> (H8*8, W8*8) spatial coefficient plane."""
    h8, w8, _ = blocks.shape
    return (
        blocks.reshape(h8, w8, 8, 8).transpose(0, 2, 1, 3).reshape(h8 * 8, w8 * 8)
    )


def plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """Inverse of `blocks_to_plane`."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(
            h // 8, w // 8, 64
        )
    )


def decode_dct_image(buf_or_path, crop_hw: tuple[int, int] | None = None):
    """jpegdecoder level-2 contract: (H, W, C) spatial DCT-coefficient image.

    Components must share one sampling grid (4:4:4, as produced by the
    reference's `subsampling=0` temp files, `_dct.py:1171-1183`); grayscale
    broadcasts the Y plane to 3 channels.  `crop_hw` crops the top-left corner
    (the reference crops to [:300, :300]).
    """
    if isinstance(buf_or_path, (str, os.PathLike)):
        with open(buf_or_path, "rb") as f:
            buf = f.read()
    else:
        buf = buf_or_path
    comps, (h, w), sampling = decode_components(buf, dequantize=True)
    if len(comps) == 1:
        planes = [blocks_to_plane(comps[0])] * 3
    else:
        if len({s for s in sampling}) != 1:
            raise JPEGDecodeError(
                "decode_dct_image requires 4:4:4 (subsampling=0) input; "
                f"got sampling {sampling}"
            )
        planes = [blocks_to_plane(c) for c in comps[:3]]
    img = np.stack(planes, axis=-1)
    if crop_hw is not None:
        img = img[: crop_hw[0], : crop_hw[1]]
    return img


def pack(buf_or_path, out_h: int, out_w: int, quality: int = 75):
    """Fully native pack step: JPEG -> decode -> half-pixel bilinear resize to
    (out_h, out_w) -> 4:2:0 re-encode at `quality` -> dequantized coefficients.

    Returns (y (out_h/8, out_w/8, 64) int16, cbcr (out_h/16, out_w/16, 128)
    int16).  The C++ hot loop of `data.packed.PackedDctDataset.create`
    (replaces PIL decode + cv2 resize + PIL encode + coefficient decode per
    image); ctypes releases the GIL so a thread pool scales it across cores.
    out_h/out_w must be multiples of 16.
    """
    if isinstance(buf_or_path, (str, os.PathLike)):
        with open(buf_or_path, "rb") as f:
            buf = f.read()
    else:
        buf = bytes(buf_or_path)
    lib = _get_lib()
    y = np.empty((out_h // 8, out_w // 8, 64), dtype=np.int16)
    cbcr = np.empty((out_h // 16, out_w // 16, 128), dtype=np.int16)
    err = ctypes.create_string_buffer(200)
    rc = lib.dctjpeg_pack(
        buf, len(buf), out_h, out_w, quality,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        cbcr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        err, ctypes.sizeof(err),
    )
    if rc != 0:
        raise JPEGDecodeError(err.value.decode(errors="replace"))
    return y, cbcr

"""4R4I packed voltage format — exact bit-level pack/unpack.

Reference behavior (SURVEY.md §0 step 2, C5): the wire carries one byte
per complex voltage sample — 4-bit two's-complement real in the HIGH
nibble, 4-bit two's-complement imaginary in the LOW nibble, each in
[-8, 7].  The CUDA `expand_input` kernel sign-extends to int8 and
corner-turns; here the same bit semantics are defined once (NumPy golden
+ jnp) and the hot path re-implements them inside the Pallas kernel
prologue (ops/gemm.py) so unpacked voltages never touch HBM.

These functions work on both NumPy and jnp arrays (the ops are dtype/bit
ops available in both).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_4r4i(re, im):
    """Pack integer real/imag in [-8, 7] into 4R4I uint8 bytes.

    Values outside [-8, 7] are clipped (the wire format saturates).
    """
    xp = jnp if isinstance(re, jnp.ndarray) else np
    re = xp.clip(re, -8, 7).astype(xp.int8)
    im = xp.clip(im, -8, 7).astype(xp.int8)
    return (
        ((re.astype(xp.uint8) & 0xF) << 4) | (im.astype(xp.uint8) & 0xF)
    ).astype(xp.uint8)


def unpack_4r4i(b):
    """Unpack 4R4I uint8 bytes -> (re, im) int8 arrays in [-8, 7].

    uint8 -> int8 must reinterpret bits (two's complement wrap), not
    numerically convert, so we bitcast; the right shift on int8 is then
    arithmetic and sign-extends the nibble.
    """
    if isinstance(b, jnp.ndarray):
        import jax.lax as lax

        hi = lax.bitcast_convert_type(b, jnp.int8)
        lo = lax.bitcast_convert_type(jnp.left_shift(b, 4), jnp.int8)
        return jnp.right_shift(hi, 4), jnp.right_shift(lo, 4)
    hi = b.view(np.int8)
    lo = np.left_shift(b, 4).view(np.int8)  # uint8 << wraps mod 256
    return np.right_shift(hi, 4), np.right_shift(lo, 4)


def unpack_wire_to_complex(wire, layout: str):
    """Golden unpack + corner-turn: wire uint8 block -> complex [F, T, P, A].

    ``layout`` is ``"tfpa"`` or ``"ftpa"`` (see config.py).  Output dtype is
    complex64 for jnp inputs, complex128 for NumPy inputs (oracle
    precision).
    """
    re, im = unpack_4r4i(wire)
    if layout == "tfpa":
        re = re.transpose(1, 0, 2, 3)
        im = im.transpose(1, 0, 2, 3)
    elif layout != "ftpa":
        raise ValueError(f"unknown layout {layout}")
    if isinstance(wire, jnp.ndarray):
        return re.astype(jnp.float32) + 1j * im.astype(jnp.float32)
    return re.astype(np.float64) + 1j * im.astype(np.float64)

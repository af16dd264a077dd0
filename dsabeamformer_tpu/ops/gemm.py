"""The fused Pallas TPU beamforming kernel — the hot loop.

This single kernel replaces three reference CUDA stages (SURVEY.md
L3-L5 / C5-C7):

- ``expand_input``       -> in-kernel 4-bit unpack prologue,
- ``cublasCgemmBatched`` -> K-concatenated int8/bf16 GEMM on the MXU,
- ``detect_sum``         -> |B|^2 + pol-sum + time-average epilogue,

so the unpacked voltages and beamformed voltages NEVER touch HBM: per
grid cell the kernel reads a packed uint8 tile and writes only the
averaged-power tile (4*B/(P*A*navg) = 0.5 bytes out per wire byte for
DSA-10, vs 16 bytes of complex64 beam voltages had the GEMM been
unfused) — the TPU-native realization of the reference's motivation for
fusing detection into the GEMM epilogue.

Design notes
------------
- Grid = (F/chan_tile, T/time_tile), time innermost: each weight tile is
  fetched once per channel group and reused across all time tiles
  (Pallas skips re-fetch when the index map is constant along a grid
  dim); chan_tile channels per cell amortize grid/DMA overhead (the
  ``cgemmBatched`` batching analog), looped with ``fori_loop`` to keep
  Mosaic compile time flat.
- Complex arithmetic via the K-concatenation trick (see ops/quantize.py)
  with K = 2*n_ant = 128 for DSA-10 — full MXU occupancy.
- Both polarizations stack along M into ONE matmul per quantization term
  (they share weights); the epilogue splits the row blocks back apart.
  No sublane<->lane reshapes anywhere (Mosaic lowers those slowly).
- int8 path stays integer until one f32 convert: int32 accumulation is
  exact (|x|<=128 incl. the x16 planes, |w|<=127, K<=1024, hi<<8
  combine => |acc| < 2^27), and dequantization is a single per-channel
  scalar on the 16x-averaged output.
- Wire blocks arrive in the canonical device form
  ``cfg.device_wire_shape`` — a free host-side view whose minor dim is a
  multiple of 128 lanes, so XLA's default parameter layout matches the
  kernel operand and no relayout copy is inserted (the 4-D form cost a
  measured ~2 ms/block relayout of the 537 MB DSA-10 block).  'tfpa'
  (time-major) blocks are consumed time-major directly: the block spec
  covers all chan_tile channels' lanes per time tile and the per-channel
  byte tile is an in-kernel lane slice — the corner-turn happens in the
  grid/DMA and is never materialized.  (Round-1/2 history: an XLA
  pre-transpose cost ~2 ms fused into the relayout copy; an in-kernel
  strided-DMA corner turn crashed Mosaic at full size — docs/DESIGN.md.)

Public API
----------
``beamform_power``    — fused path: wire block -> averaged powers
                        (BASELINE configs 2+3).
``beamform_voltages`` — unfused tail: wire block -> beamformed voltages
                        (validation / parity with BASELINE config 2; the
                        float-path cross-check for the fused epilogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsabeamformer_tpu.config import ObsConfig, shrink_tiles
from dsabeamformer_tpu.ops.quantize import QuantWeights


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unpack_tile(x_u8, x16: bool):
    """uint8 (rows, cols) -> int8 4R4I nibble planes, the unpack prologue.

    Mosaic has no 8-bit vector shifts, so the work happens in int32.
    Sign extension by masked arithmetic (``((v + 8) & 15) - 8``) instead
    of compare+select — 3 ALU ops per nibble, no predication.  With
    ``x16`` also returns the 16x-scaled planes for the int12 K-folding
    (exact in int8: |16x| <= 128 for 4-bit x).  Returns (re, im) or
    (16re, 16im, re, im), each int8 with the input's shape.
    """
    x32 = x_u8.astype(jnp.int32)
    # Real in the high nibble, imag in the low (config.py wire format).
    re = ((jnp.right_shift(x32, 4) + 8) & 15) - 8
    im = ((x32 + 8) & 15) - 8  # carries into bit 4 are masked off
    if x16:
        return (
            jnp.left_shift(re, 4).astype(jnp.int8),
            jnp.left_shift(im, 4).astype(jnp.int8),
            re.astype(jnp.int8),
            im.astype(jnp.int8),
        )
    return re.astype(jnp.int8), im.astype(jnp.int8)


def _build_x(x_bytes, *, n_ant, a_compute, n_pol, x16, x_dup=False):
    """Wire byte tile ``[Tt, P*A]`` -> MXU X operand ``[P*Tt, K]`` int8.

    Slices each pol's byte columns to the first ``a_compute`` antennas
    BEFORE unpacking (zero-padded slots never reach the VPU), stacks the
    nibble planes along lanes to match the weight rows — ``[re | im]``
    (K = 2*a_compute), ``[16re | 16im | re | im]`` (int12,
    K = 4*a_compute), or that block twice (int13's double fold,
    ``x_dup``, K = 8*a_compute) — and stacks the pols along sublanes
    (M): both pols share weights, so one MXU dispatch with 2x M
    amortizes array fill.
    """
    rows = []
    for p in range(n_pol):
        cols = x_bytes[:, p * n_ant : p * n_ant + a_compute]
        planes = _unpack_tile(cols, x16)
        if x_dup:
            # int13: the double fold repeats the int12 plane block in
            # the lane axis — ONE concat of 8 (shared) plane pieces.
            planes = planes + planes
        rows.append(jnp.concatenate(planes, axis=1))
    return jnp.concatenate(rows, axis=0)


def _accumulate(x_all, w_refs, *, chan):
    """Quantized-unit GEMM: ``x_all [M, K] @ w [K, 2B]`` per term.

    Scaling is DEFERRED: the result is in units of the last term's scale
    (int8x2 terms are spaced by exactly 2^8, so the int32 partials
    combine as ``(M_hi << 8) + M_lo``; int12 folds its hi/lo terms into
    K so a single dot already yields ``16*X@W_hi + X@W_lo``; bf16x2
    terms carry scale 1 and add directly in f32).  The caller multiplies
    the final *averaged* output by ``scale**power`` — 16x fewer elements
    than scaling here.  Keeping the VPU epilogue this thin matters: the
    per-element float work would otherwise rival the MXU time.

    Each quantization term is a separate kernel input (Mosaic rejects
    stacked 4-D blocks, so terms are unstacked at the call site).
    Returns ``[M, 2B]`` float32, in quantized units.
    """
    if w_refs[0].dtype == jnp.int8:
        m = jnp.dot(x_all, w_refs[0][chan], preferred_element_type=jnp.int32)
        if len(w_refs) == 2:
            m_lo = jnp.dot(
                x_all, w_refs[1][chan], preferred_element_type=jnp.int32
            )
            # Exact: s_hi == 256 * s_lo by construction (ops/quantize.py).
            m = jnp.left_shift(m, 8) + m_lo
        return m.astype(jnp.float32)
    acc = None
    for w_ref in w_refs:
        w = w_ref[chan]
        # f32 is the validation mode: force full-precision MXU passes.
        # The TPU default silently computes f32 matmuls at bf16 operand
        # precision (measured 4e-2 vs golden — identical to bf16 mode);
        # HIGHEST restores ~1e-6.  bf16 operands are unaffected.
        prec = (jax.lax.Precision.HIGHEST if w.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        part = jnp.dot(
            x_all.astype(w.dtype), w, preferred_element_type=jnp.float32,
            precision=prec,
        )
        acc = part if acc is None else acc + part
    return acc


def _chan_loop(fc: int, chan_body):
    """fori_loop over the channel tile with a manual 2-channel unroll.

    fori_loop (not Python unroll) keeps Mosaic compile time flat (the
    fully unrolled form took minutes at chan_tile=8); Mosaic supports
    only full unroll or none, so the partial unroll is done by hand —
    two channels per loop body let the scheduler overlap one channel's
    VPU unpack/epilogue with the other's MXU passes.
    """
    if fc % 2 == 0:
        def chan_pair(c2, _):
            chan_body(2 * c2, 0)
            chan_body(2 * c2 + 1, 0)
            return 0

        jax.lax.fori_loop(0, fc // 2, chan_pair, 0)
    else:
        jax.lax.fori_loop(0, fc, chan_body, 0)


def _detect_kernel(x_ref, *refs, n_ant, a_compute, n_beams, n_pol, n_terms,
                   navg_time, x16, x_dup, time_major, epilogue,
                   n_active=0, flagged=(), quant8=False, quant8_offset=0.0,
                   sk_active=0):
    """Shared fused detection kernel: unpack prologue + GEMM + a
    pluggable quadratic epilogue (power or full Stokes), deferred-s^2
    dequantized on the time-averaged output.

    ``n_active > 0`` adds the incoherent-sum product as a SECOND output
    ref: sum of ``re^2 + im^2`` over the first ``n_active`` antennas
    and both pols, time-averaged — reusing the unpacked planes already
    in VMEM so the 4-bit wire bytes are read from HBM exactly once
    (VERDICT r2 #5; the standalone ``ops.incoherent.incoherent_power``
    is a second full HBM pass over the wire block).

    ``quant8`` adds a per-beam scale input ref and stores the detection
    product as uint8 ``clip(rint(power * scale), 0, 255)`` — the 8-bit
    filterbank output quantized IN the epilogue, so the f32 product
    never touches HBM (vs the standalone ``FilterbankSink.device_post``
    pass: kernel writes 4 B/sample + quantizer reads 4 + writes 1).

    ``sk_active > 0`` adds a THIRD output ref with the per-channel
    spectral-kurtosis accumulators (lane 0: S1 = sum p, lane 1:
    S2 = sum p^2 over every (time, pol, antenna < sk_active) sample,
    raw 4-bit units) — the streaming RFI monitor's statistic computed
    from the planes already in VMEM, replacing the standalone
    ``sk_block_stats`` pass that costs a second 13.7 ms HBM sweep of
    the wire block (BENCH.md "RFI monitor overhead").  The block is
    revisited across the sequential time-grid axis (zeroed at t==0,
    accumulated after), the canonical Pallas accumulator pattern.
    """
    idx = n_terms
    w_refs = refs[:idx]
    s_ref = refs[idx]
    idx += 1
    q_ref = None
    if quant8:
        q_ref = refs[idx]
        idx += 1
    o_ref = refs[idx]
    idx += 1
    i_ref = None
    if n_active:
        i_ref = refs[idx]
        idx += 1
    sk_ref = refs[idx] if sk_active else None
    if sk_active:
        @pl.when(pl.program_id(1) == 0)
        def _zero_sk():
            sk_ref[...] = jnp.zeros_like(sk_ref)
    pa = n_pol * n_ant
    if time_major:
        # x_ref is [time_tile, chan_tile * P*A]: the wire block stayed in
        # its time-major capture order and the per-channel byte tile is a
        # lane-axis slice.  This IS the corner-turn — done by the
        # grid/DMA, never materialized.  Mosaic dynamic lane slices must
        # be 128-aligned: when P*A >= 128 the per-channel slice at c*PA
        # is aligned directly; for COMPACT wire formats (P*A < 128,
        # e.g. a 16-slot antenna axis at 8x less PCIe than the padded
        # 64-slot reference format) channels are sliced in groups of
        # 128/PA lanes — one aligned dynamic slice per group, static
        # sub-slices within it.
        tt = x_ref.shape[0]
        fc = x_ref.shape[1] // pa
    else:
        fc = x_ref.shape[0]  # chan_tile
        tt = x_ref.shape[1]  # time_tile

    def process(c, xb):
        x_all = _build_x(xb, n_ant=n_ant, a_compute=a_compute,
                         n_pol=n_pol, x16=x16, x_dup=x_dup)
        acc = _accumulate(x_all, w_refs, chan=c)
        out = epilogue(acc, tt, n_beams, n_pol, navg_time)
        # Deferred dequantization: one scalar multiply on the averaged
        # (16x smaller) output.  s is the last term's scale (1.0 for
        # float modes); every epilogue term is quadratic in the same
        # quantized units, so s^2 dequantizes them all.
        s = s_ref[c, 0, n_terms - 1]
        if quant8:
            # Parenthesized to round exactly like the two-pass path
            # (which stores out*(s*s) to f32, then rints the product
            # with the beam scale): byte-for-byte identical output.
            v = (out * (s * s)) * q_ref[0, 0]
            if quant8_offset:
                # Stokes 8-bit: the signed Q/U/V planes (lanes >= B in
                # the [I|Q|U|V] lane layout) ride the unsigned payload
                # at the file format's fixed midpoint offset, I stays
                # at 0 — same per-IF offsets the two-pass quantizer
                # applies (ingest/sigproc.py STOKES_QUV_OFFSET).
                lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                v = v + jnp.where(lane < n_beams, 0.0,
                                  jnp.float32(quant8_offset))
            # Mosaic has no f32->uint8 cast; go through int32 (exact:
            # the value is already rint'ed and clipped to [0, 255]).
            o_ref[c] = jnp.clip(jnp.rint(v), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)
        else:
            o_ref[c] = out * (s * s)
        if n_active or sk_active:
            # Shared by both side-products: the plain [re | im] planes
            # are the LAST 2*a_compute lanes of every x_all layout
            # (x16 modes prepend the 16x planes; int13's duplicate
            # block ends with them too).
            plain = x_all[:, x_all.shape[1] - 2 * a_compute:]
        if n_active:
            # Square in f32 (exact: |x| <= 8 -> x^2 <= 64; bf16/f32
            # represent integers <= 256 exactly) — Mosaic has no 8-bit
            # vector multiply (the 8-bit-shift dead-end family,
            # docs/DESIGN.md §4).  Full-width: the incoherent matvec
            # wants the whole [P*tt, 2a] operand (this is what the
            # side-product tile shrink budgets for); the SK path below
            # slices sq in chunks when it is already live, and builds
            # its own chunked squares when it is not.
            xf = plain.astype(jnp.float32)
            sq = xf * xf                              # [P*tt, 2a] f32
        if n_active:
            # The antenna reduction rides the MXU as a matvec against
            # a masked ones vector instead of a cross-lane VPU reduce
            # (measured: the VPU lane-reduce form cost +14 ms/block at
            # the DSA-10 preset; the matvec is ~0.1% of the main
            # GEMM's MACs).  The activity mask is folded into the ones
            # vector — no per-element select.  Built in-kernel from
            # iota (Pallas rejects captured constant arrays);
            # `flagged` is a static tuple, so the bad-antenna compares
            # unroll at trace time.
            ant = jax.lax.broadcasted_iota(
                jnp.int32, (2 * a_compute, 1), 0
            ) % a_compute
            keep = ant < n_active
            for fa in flagged:
                keep = keep & (ant != fa)
            ones = keep.astype(jnp.float32)
            v = jnp.dot(sq, ones,
                        preferred_element_type=jnp.float32)  # [P*tt, 1]
            tot = v[:tt]
            for q in range(1, n_pol):
                tot = tot + v[q * tt : (q + 1) * tt]  # pol sum [tt, 1]
            i_ref[c] = tot.reshape(tt // navg_time, navg_time).sum(
                axis=1, keepdims=True                 # [tt/navg, 1]
            )
        if sk_active:
            # SK accumulators from the same planes (ALL active
            # antennas — detection must SEE flagged/RFI antennas, so
            # no exclusion here, matching ops.incoherent.sk_block_stats
            # exactly).  Output is PER-ANTENNA rows [2, a_compute]
            # (sublane 0: S1 = sum_t,p of p; sublane 1: S2 = sum p^2);
            # the caller sums the active lanes.  Everything reduces by
            # sublane-segmented tree sums — the incoherent epilogue's
            # cheap navg pattern — chunked so no full-width f32
            # intermediate is ever live (no tile shrink needed).
            #
            # v1 did per-channel MXU matvecs (s2 at HIGHEST) plus two
            # full-column scalar reductions into a [1, 2] row: measured
            # +7.3 ms/block at a 256-chan subband (+44 ms full band,
            # bench_artifacts/r05/measure_rfi.json), of which the
            # matvecs were +4.2 and the scalar sums +1.5
            # (scripts/exp_sk_cost.py).  All-f32 adds here are also
            # exactly sk_block_stats' precision class (p <= 128 ints:
            # per-antenna per-tile S1 < 2^24 stays f32-exact).
            rows = plain.shape[0]
            ch = 512 if rows % 512 == 0 else rows

            def _colsum(m):
                # [R, a] -> [1, a] via halving sublane adds.  NOT a
                # [R/8, 8, a] reshape-sum: Mosaic relayout-fails on
                # sublane-split 3-D vectors with sub-128 lane dims
                # ("Invalid relayout ... 8x8x32xf32", v5e 2026-08-19).
                r = m.shape[0]
                while r > 1 and r % 2 == 0:
                    m = m[: r // 2] + m[r // 2: r]
                    r //= 2
                return m.sum(axis=0, keepdims=True) if r > 1 else m

            s1row = jnp.zeros((1, a_compute), jnp.float32)
            s2row = jnp.zeros((1, a_compute), jnp.float32)
            for k in range(rows // ch):
                if n_active:
                    sqk = sq[k * ch:(k + 1) * ch]
                else:
                    xfk = plain[k * ch:(k + 1) * ch].astype(jnp.float32)
                    sqk = xfk * xfk
                pk = sqk[:, :a_compute] + sqk[:, a_compute:]  # [ch, a]
                s1row = s1row + _colsum(pk)
                s2row = s2row + _colsum(pk * pk)
            sk_ref[c] = sk_ref[c] + jnp.concatenate(
                [s1row, s2row], axis=0)

    if time_major and pa % 128 and 128 % pa == 0 and fc % (128 // pa) == 0:
        g = 128 // pa  # channels per aligned lane group

        def group_body(cg, _):
            xg = x_ref[:, pl.ds(cg * 128, 128)]
            for j in range(g):  # static sub-slices within the group
                process(cg * g + j, xg[:, j * pa : (j + 1) * pa])
            return 0

        jax.lax.fori_loop(0, fc // g, group_body, 0)
        return

    def chan_body(c, _):
        xb = x_ref[:, pl.ds(c * pa, pa)] if time_major else x_ref[c]
        process(c, xb)
        return 0

    _chan_loop(fc, chan_body)


def _power_epilogue(acc, tt, n_beams, n_pol, navg_time):
    """|B|^2 + pol sum + navg_time accumulation -> [tt/navg, B]."""
    br = acc[:, :n_beams]
    bi = acc[:, n_beams:]
    p = br * br + bi * bi  # (P*Tt, B), quantized-units^2
    # Pol sum: row blocks are stacked per pol.
    power = p[:tt]
    for q in range(1, n_pol):
        power = power + p[q * tt : (q + 1) * tt]
    return power.reshape(tt // navg_time, navg_time, n_beams).sum(axis=1)


def _stokes_epilogue(acc, tt, n_beams, n_pol, navg_time):
    """Full Stokes: [I | Q | U | V] along lanes -> [tt/navg, 4*B].

    Convention (linear feeds; documented in ``beamform_stokes``):
    I = |Bx|^2+|By|^2, Q = |Bx|^2-|By|^2, U = 2 Re(Bx By*),
    V = 2 Im(Bx By*).  The Stokes axis rides the lane dim (Mosaic takes
    <=3 output dims); the caller reshapes to [..., 4, B].
    """
    def avg(z):
        return z.reshape(tt // navg_time, navg_time, n_beams).sum(axis=1)

    bxr = acc[:tt, :n_beams]
    bxi = acc[:tt, n_beams:]
    byr = acc[tt : 2 * tt, :n_beams]
    byi = acc[tt : 2 * tt, n_beams:]
    px = bxr * bxr + bxi * bxi
    py = byr * byr + byi * byi
    cr = bxr * byr + bxi * byi          # Re(Bx By*)
    ci = bxi * byr - bxr * byi          # Im(Bx By*)
    return jnp.concatenate(
        [avg(px + py), avg(px - py), avg(cr + cr), avg(ci + ci)],
        axis=1,
    )


def _voltage_kernel(x_ref, *refs, n_ant, a_compute, n_beams, n_pol, n_terms,
                    x16, x_dup):
    w_refs, (s_ref, o_ref) = refs[:n_terms], refs[n_terms:]
    fc = x_ref.shape[0]
    tt = x_ref.shape[1]

    def chan_body(c, _):
        x_all = _build_x(x_ref[c], n_ant=n_ant, a_compute=a_compute,
                         n_pol=n_pol, x16=x16, x_dup=x_dup)
        acc = _accumulate(x_all, w_refs, chan=c)
        acc = acc * s_ref[c, 0, n_terms - 1]  # dequantize voltages
        # Output is [F, T, P*2B] (pol folded into the lane axis: Mosaic
        # rejects 4-D output blocks); caller reshapes to [F, T, P, 2B].
        n2b = acc.shape[1]
        for p in range(n_pol):
            o_ref[c, :, p * n2b : (p + 1) * n2b] = acc[p * tt : (p + 1) * tt]
        return 0

    jax.lax.fori_loop(0, fc, chan_body, 0)


def _check_weights(qw: QuantWeights, cfg: ObsConfig) -> None:
    want = (cfg.n_chan, cfg.gemm_k, 2 * cfg.n_beams)
    for term in qw.terms:
        got = tuple(term.shape)
        if got != want:
            raise ValueError(
                f"quantized weight term shaped {got} does not match config "
                f"{cfg.name!r} (expected [F,K,2B] = {want} for mode "
                f"{cfg.weight_mode!r} / a_compute={cfg.a_compute}); "
                f"regenerate with prepare_weights(cfg, make_weights(cfg))"
            )
    if qw.scales.shape != (cfg.n_chan, len(qw.terms)):
        raise ValueError(
            f"weight scales shaped {tuple(qw.scales.shape)} do not match "
            f"[F, n_terms] = {(cfg.n_chan, len(qw.terms))}"
        )


def _prepare_wire(wire: jax.Array, cfg: ObsConfig) -> tuple:
    """Wire block -> ``(x, time_major)``, the kernel's input array.

    The canonical device form is ``cfg.device_wire_shape`` (a free
    host-side view of the capture buffer) — XLA's default layout for it
    matches the kernel operand exactly, so no relayout copy is inserted:

    - 'ftpa': ``[F, T, P*A]`` consumed channel-major (``time_major=False``).
    - 'tfpa': ``[T, F*P*A]`` consumed time-major — the corner-turn the
      reference did with a CUDA ``expand_input`` kernel (SURVEY.md L3)
      happens in the Pallas grid/DMA + an in-kernel lane slice, never as
      an XLA transpose.

    The legacy 4-D ``cfg.wire_block_shape`` form is still accepted for
    tests/tooling; on TPU it costs an in-jit relayout (and for 'tfpa' a
    materialized transpose), measured ~2 ms per DSA-10 block.
    """
    if wire.dtype != jnp.uint8:
        raise ValueError(f"wire must be uint8 4R4I bytes, got {wire.dtype}")
    pa = cfg.n_pol * cfg.n_ant
    if wire.shape == cfg.device_wire_shape:
        return wire, cfg.input_layout == "tfpa"
    if wire.shape != cfg.wire_block_shape:
        raise ValueError(
            f"wire shape {wire.shape} is neither the canonical device form "
            f"{cfg.device_wire_shape} nor the 4-D host form "
            f"{cfg.wire_block_shape} for layout {cfg.input_layout!r}"
        )
    if cfg.input_layout == "tfpa":
        return wire.reshape(cfg.t_block, cfg.n_chan * pa), True
    return wire.reshape(cfg.n_chan, cfg.t_block, pa), False


def device_wire_view(wire, cfg: ObsConfig):
    """Host-side 4-D capture block -> the canonical device form (a free
    reshape view; ``device_put`` this, not the 4-D array)."""
    import numpy as np

    arr = np.asarray(wire)
    if arr.shape != cfg.wire_block_shape:
        raise ValueError(
            f"wire shape {arr.shape} != host form {cfg.wire_block_shape}"
        )
    return arr.reshape(cfg.device_wire_shape)


def _common_specs(cfg: ObsConfig, n_terms: int, time_major: bool = False):
    a2 = cfg.gemm_k
    b2 = 2 * cfg.n_beams
    fc = cfg.chan_tile
    pa = cfg.n_pol * cfg.n_ant
    if time_major:
        # Time-major wire [T, F*PA]: the block covers all chan_tile
        # channels' lanes for a time tile — contiguous fc*PA-byte rows,
        # the grid-level corner turn.
        wire_spec = pl.BlockSpec(
            (cfg.time_tile, fc * pa),
            lambda f, t: (t, f),
            memory_space=pltpu.VMEM,
        )
    else:
        wire_spec = pl.BlockSpec(
            (fc, cfg.time_tile, pa),
            lambda f, t: (f, t, 0),
            memory_space=pltpu.VMEM,
        )
    in_specs = [wire_spec] + [
        # One spec per quantization term: [chan_tile, gemm_k, 2B],
        # constant along the (innermost) time grid dim so each weight
        # tile is fetched once per channel group.
        pl.BlockSpec(
            (fc, a2, b2), lambda f, t: (f, 0, 0), memory_space=pltpu.VMEM
        )
        for _ in range(n_terms)
    ] + [
        # Scales as [F, 1, n_terms] so the constrained last-two block dims
        # (1, n_terms) exactly match the array dims (Mosaic block rule).
        pl.BlockSpec(
            (fc, 1, n_terms), lambda f, t: (f, 0, 0), memory_space=pltpu.SMEM
        ),
    ]
    return in_specs


def _cost(cfg: ObsConfig, n_terms: int, weight_bytes: int, out_bytes: int):
    macs = cfg.macs_per_block * n_terms
    return pl.CostEstimate(
        flops=2 * macs,
        bytes_accessed=cfg.wire_block_bytes + weight_bytes + out_bytes,
        transcendentals=0,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "incoherent",
                                             "flag_ants", "sk_stats"))
def beamform_power(
    wire: jax.Array,
    qw: QuantWeights,
    cfg: ObsConfig,
    interpret: bool | None = None,
    incoherent: bool = False,
    flag_ants: tuple = (),
    quant8_scales: jax.Array | None = None,
    sk_stats: bool = False,
) -> jax.Array:
    """Fused pipeline: 4R4I wire block -> averaged beam powers.

    Returns float32 ``[F/navg_freq, T/navg_time, B]`` (sum over
    navg_time samples, both pols, and navg_freq adjacent channels —
    matching ``ops.reference.beamform_block_ref``).

    ``incoherent=True`` additionally returns the incoherent-sum total
    power ``[F/navg_freq, T/navg_time]`` (semantics of
    ``ops.incoherent.incoherent_power``) as a second output of the SAME
    kernel — the wire bytes are read from HBM once for both products.
    ``flag_ants`` (static tuple of raw antenna indices) excludes bad
    antennas from the incoherent sum; the coherent product is flagged
    on the weight side instead (``models.weights.flag_antennas``),
    so the tuple only matters with ``incoherent=True``.

    ``quant8_scales`` (``[n_beams]`` float32, counts-per-unit-power)
    fuses the 8-bit filterbank quantization into the epilogue: the
    power product comes back uint8 ``clip(rint(p * scale_b), 0, 255)``
    — byte-identical to quantizing the f32 output after the fact, but
    the f32 product never round-trips HBM (the fil sink's output path;
    see ``FilterbankSink.fused_quant8_scales``).  Requires
    ``navg_freq == 1`` (quantization must follow any channel
    averaging); the incoherent side-product stays float32.

    ``sk_stats=True`` appends the per-RAW-channel spectral-kurtosis
    accumulators ``[n_chan, 2]`` (S1, S2 — the semantics of
    ``ops.incoherent.sk_block_stats``) as the LAST output, computed in
    the same kernel so the streaming RFI monitor costs no second HBM
    pass over the wire bytes (BENCH.md "RFI monitor overhead").
    """
    if quant8_scales is not None and cfg.navg_freq != 1:
        raise ValueError(
            f"quant8_scales requires navg_freq=1 (got {cfg.navg_freq}): "
            f"in-epilogue quantization must be the LAST averaging step; "
            f"use FilterbankSink.device_post for navg_freq > 1")
    out = _fused_detect(wire, qw, cfg, interpret, _power_epilogue,
                        out_width=cfg.n_beams, incoherent=incoherent,
                        flag_ants=flag_ants, quant8_scales=quant8_scales,
                        sk_stats=sk_stats)
    sk = None
    if sk_stats:
        *rest, sk = out
        out = tuple(rest) if len(rest) > 1 else rest[0]
        # Kernel emits per-antenna rows [n_chan, 2, a_compute]; the
        # antenna reduction happens here (f32, tiny array) instead of
        # per-channel in-kernel matvecs (exp_sk_cost.py).
        sk = sk[:, :, :cfg.n_ant_active].sum(axis=2)  # [n_chan, 2]
    if incoherent:
        out, inco = out
        inco = inco[:, :, 0]  # drop the kernel's singleton lane axis
    if cfg.navg_freq > 1:
        f, t, b = out.shape
        out = out.reshape(f // cfg.navg_freq, cfg.navg_freq, t, b).sum(axis=1)
        if incoherent:
            inco = inco.reshape(f // cfg.navg_freq, cfg.navg_freq, t).sum(axis=1)
    parts = [out]
    if incoherent:
        parts.append(inco)
    if sk_stats:
        parts.append(sk)
    return tuple(parts) if len(parts) > 1 else out


def _fused_detect(wire, qw, cfg, interpret, epilogue, *, out_width,
                  incoherent=False, flag_ants=(), quant8_scales=None,
                  quant8_offset=0.0, sk_stats=False):
    """Shared fused-kernel invocation for the detection products
    (power: out_width=B; Stokes: out_width=4*B).  Optional extra
    outputs, in order after the detection product: the incoherent sum
    (``incoherent``) and the per-channel SK accumulators
    (``sk_stats``)."""
    interpret = _default_interpret() if interpret is None else interpret
    _check_weights(qw, cfg)
    if flag_ants and (min(flag_ants) < 0
                      or max(flag_ants) >= cfg.n_ant_active):
        raise ValueError(
            f"flag_ants {sorted(flag_ants)} out of range "
            f"[0, n_ant_active={cfg.n_ant_active})")
    x, time_major = _prepare_wire(wire, cfg)
    pa = cfg.n_pol * cfg.n_ant
    grouped_ok = (
        pa % 128 == 0
        or (128 % pa == 0 and (cfg.chan_tile * pa) % 128 == 0)
    )
    if time_major and not grouped_ok and not interpret:
        # Mosaic lane slices must be 128-aligned; the kernel handles
        # P*A >= 128 directly and P*A < 128 via channel groups (compact
        # wire formats) — anything else (e.g. chan_tile*P*A not a lane
        # multiple) falls back to the materialized corner-turn.
        x = jnp.transpose(x.reshape(cfg.t_block, cfg.n_chan, pa), (1, 0, 2))
        time_major = False
    n_terms = len(qw.terms)
    quant8 = quant8_scales is not None
    if quant8 and quant8_scales.shape != (cfg.n_beams,):
        raise ValueError(
            f"quant8_scales must be [n_beams]={cfg.n_beams}, "
            f"got {quant8_scales.shape}")
    grid = (cfg.n_chan // cfg.chan_tile, cfg.t_block // cfg.time_tile)
    out_shape = jax.ShapeDtypeStruct(
        (cfg.n_chan, cfg.t_block // cfg.navg_time, out_width),
        jnp.uint8 if quant8 else jnp.float32,
    )
    out_spec = pl.BlockSpec(
        (cfg.chan_tile, cfg.time_tile // cfg.navg_time, out_width),
        lambda f, t: (f, t, 0),
        memory_space=pltpu.VMEM,
    )
    if incoherent or sk_stats:
        what = "incoherent product" if incoherent else "SK stats"
        if cfg.n_ant_active > cfg.a_compute:
            raise ValueError(
                f"fused {what} needs n_ant_active="
                f"{cfg.n_ant_active} <= a_compute={cfg.a_compute}"
            )
    if incoherent or sk_stats:
        # EITHER side-product's in-kernel intermediates push the
        # deployed DSA-10 tiles (already ~0.8 MB under Mosaic's 16 MB
        # scoped-VMEM stack) over the limit — the incoherent matvec's
        # full-width plain/sq planes by ~1.16 MB, the chunked SK sums
        # by 64-288 KB (measured at ch=128..512).  Halve time_tile
        # below the measured-safe threshold — the grid doubles but
        # per-block cost moves only ~1-2% (BENCH.md "Incoherent
        # product").  chan_tile stays: the intermediates don't scale
        # with it, so shrinking it would cut the grid for nothing.
        cfg2 = shrink_tiles(
            cfg, lambda fc, tt: cfg.n_pol * tt * 2 * cfg.n_beams * 4,
            2 ** 23 - 1, allow_chan=False)
        if cfg2 is not cfg:
            cfg = cfg2
            grid = (cfg.n_chan // cfg.chan_tile,
                    cfg.t_block // cfg.time_tile)
            out_spec = pl.BlockSpec(
                (cfg.chan_tile, cfg.time_tile // cfg.navg_time, out_width),
                lambda f, t: (f, t, 0),
                memory_space=pltpu.VMEM,
            )
    if incoherent:
        # Trailing singleton axis: a 2-D [F, T/navg] output block would
        # have a non-128 lane dim (Mosaic block rule); with the 1-wide
        # last dim the block equals the array dim there.  The caller
        # squeezes it.
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (cfg.n_chan, cfg.t_block // cfg.navg_time, 1), jnp.float32
        ))
        out_spec = (out_spec, pl.BlockSpec(
            (cfg.chan_tile, cfg.time_tile // cfg.navg_time, 1),
            lambda f, t: (f, t, 0),
            memory_space=pltpu.VMEM,
        ))
    if sk_stats:
        # [n_chan, 2, a_compute] f32, revisited across the sequential
        # time axis (index_map constant in t): sublane 0 = per-antenna
        # S1, sublane 1 = S2 (the caller sums the active lanes).  The
        # non-128 last dim is fine — Mosaic pads the tile, exactly like
        # the incoherent product's 1-wide lane dim above.
        shapes = list(out_shape) if isinstance(out_shape, tuple) \
            else [out_shape]
        specs = list(out_spec) if isinstance(out_spec, tuple) \
            else [out_spec]
        shapes.append(jax.ShapeDtypeStruct((cfg.n_chan, 2, cfg.a_compute),
                                           jnp.float32))
        specs.append(pl.BlockSpec((cfg.chan_tile, 2, cfg.a_compute),
                                  lambda f, t: (f, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = tuple(shapes)
        out_spec = tuple(specs)
    kernel = functools.partial(
        _detect_kernel,
        n_ant=cfg.n_ant,
        a_compute=cfg.a_compute,
        n_beams=cfg.n_beams,
        n_pol=cfg.n_pol,
        n_terms=n_terms,
        navg_time=cfg.navg_time,
        x16=cfg.weight_mode in ("int12", "int13"),
        x_dup=cfg.weight_mode == "int13",
        time_major=time_major,
        epilogue=epilogue,
        n_active=cfg.n_ant_active if incoherent else 0,
        flagged=tuple(sorted(flag_ants)) if incoherent else (),
        quant8=quant8,
        quant8_offset=quant8_offset,
        sk_active=cfg.n_ant_active if sk_stats else 0,
    )
    in_specs = _common_specs(cfg, n_terms, time_major)
    operands = [x, *qw.terms, qw.scales[:, None, :]]
    if quant8:
        # Per-beam 8-bit scale vector as a [1, 1, out_width] VMEM
        # block, constant across the grid (fetched once, like the
        # weights).  For Stokes (out_width = 4*B) the per-beam scales
        # tile across the [I|Q|U|V] lane planes — one scale per beam,
        # same convention as the two-pass quantizer.
        sv = quant8_scales.astype(jnp.float32)
        if out_width != cfg.n_beams:
            sv = jnp.tile(sv, out_width // cfg.n_beams)
        in_specs.append(pl.BlockSpec(
            (1, 1, out_width), lambda f, t: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(sv[None, None, :])
    if isinstance(out_shape, tuple):
        out_bytes = sum(s.size * s.dtype.itemsize for s in out_shape)
    else:
        out_bytes = out_shape.size * out_shape.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=_cost(
            cfg, n_terms,
            weight_bytes=sum(w.size * w.dtype.itemsize for w in qw.terms),
            out_bytes=out_bytes,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "incoherent",
                                             "flag_ants", "sk_stats"))
def beamform_stokes(
    wire: jax.Array,
    qw: QuantWeights,
    cfg: ObsConfig,
    interpret: bool | None = None,
    incoherent: bool = False,
    flag_ants: tuple = (),
    quant8_scales: jax.Array | None = None,
    sk_stats: bool = False,
) -> jax.Array:
    """Fused full-Stokes pipeline: wire block -> averaged Stokes spectra.

    Returns float32 ``[F/navg_freq, T/navg_time, 4, B]`` with the Stokes
    axis ordered ``[I, Q, U, V]`` for the linear-feed convention

        I = |Bx|^2 + |By|^2        Q = |Bx|^2 - |By|^2
        U = 2 Re(Bx conj(By))      V = 2 Im(Bx conj(By))

    (x = pol 0, y = pol 1 of the wire block).  ``[..., 0, :]`` equals
    ``beamform_power``'s output.  No reference counterpart (the CUDA
    pipeline detects Stokes I only — SURVEY.md L5); polarization work
    there required offline voltage dumps.

    The output block is 4x the power path's, so the default DSA-10
    tiles exceed VMEM — use e.g. ``cfg.replace(time_tile=1024,
    chan_tile=4)`` (the CLI's ``--products stokes`` adjusts tiles
    automatically) — and at t_block=8192 two in-flight 4.3 GB Stokes
    outputs exhaust HBM, so deploy at t_block <= 4096.  An opt-in
    product, not the search hot path — measured numbers in BENCH.md
    "Full-Stokes mode".

    ``quant8_scales`` (``[n_beams]`` float32) fuses the 8-bit Stokes
    filterbank quantization into the epilogue: the product comes back
    uint8 ``[F, T/navg, 4, B]`` with ``counts = x*scale_b + offset``
    where offset is 0 for I and ``STOKES_QUV_OFFSET`` (=128, the
    signed-plane midpoint) for Q/U/V — byte-identical to the two-pass
    ``FilterbankSink.device_post`` quantizer, but the 4x f32 Stokes
    block (the path's HBM cost that held it at 0.99x realtime) never
    touches HBM: the kernel stores 1 byte/sample.  Requires
    ``navg_freq == 1`` like the power path.
    """
    if quant8_scales is not None and cfg.navg_freq != 1:
        raise ValueError(
            f"quant8_scales requires navg_freq=1 (got {cfg.navg_freq}): "
            f"in-epilogue quantization must be the LAST averaging step; "
            f"use FilterbankSink.device_post for navg_freq > 1")
    # The midpoint-offset constant lives with the file format it
    # serves; the lazy import keeps ops free of any ingest dependency
    # at module load (sigproc itself only imports config).
    from dsabeamformer_tpu.ingest.sigproc import STOKES_QUV_OFFSET

    out = _fused_detect(wire, qw, cfg, interpret, _stokes_epilogue,
                        out_width=4 * cfg.n_beams, incoherent=incoherent,
                        flag_ants=flag_ants, sk_stats=sk_stats,
                        quant8_scales=quant8_scales,
                        quant8_offset=STOKES_QUV_OFFSET)
    sk = None
    if sk_stats:
        *rest, sk = out
        out = tuple(rest) if len(rest) > 1 else rest[0]
        # [n_chan, 2]: S1, S2 (see beamform_power)
        sk = sk[:, :, :cfg.n_ant_active].sum(axis=2)
    if incoherent:
        # Same fused side-product as beamform_power(incoherent=True):
        # one HBM pass over the wire bytes for all five planes.
        out, inco = out
        inco = inco[:, :, 0]
    out = out.reshape(
        cfg.n_chan, cfg.t_block // cfg.navg_time, 4, cfg.n_beams
    )
    if cfg.navg_freq > 1:
        f = out.shape[0]
        out = out.reshape(f // cfg.navg_freq, cfg.navg_freq,
                          *out.shape[1:]).sum(axis=1)
        if incoherent:
            inco = inco.reshape(f // cfg.navg_freq, cfg.navg_freq,
                                -1).sum(axis=1)
    parts = [out]
    if incoherent:
        parts.append(inco)
    if sk_stats:
        parts.append(sk)
    return tuple(parts) if len(parts) > 1 else out


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def beamform_voltages(
    wire: jax.Array,
    qw: QuantWeights,
    cfg: ObsConfig,
    interpret: bool | None = None,
) -> jax.Array:
    """Unfused tail: wire block -> beamformed voltages.

    Returns float32 ``[F, T, P, 2B]`` where ``[..., :B]`` is Re and
    ``[..., B:]`` is Im.  HBM-heavy by design — this is the validation
    path the fused epilogue is tolerance-checked against (BASELINE
    config 3) and the parity point for config 2.
    """
    interpret = _default_interpret() if interpret is None else interpret
    _check_weights(qw, cfg)
    x, time_major = _prepare_wire(wire, cfg)
    if time_major:
        # The validation kernel is channel-major only; materialize the
        # corner-turn here (HBM-heavy path by design, see docstring).
        pa = cfg.n_pol * cfg.n_ant
        x = jnp.transpose(
            x.reshape(cfg.t_block, cfg.n_chan, pa), (1, 0, 2)
        )
    # The voltage output tile is f32 [fc, tt, P*2B] — 4x(navg_time)x the
    # fused power path's, so the config's (fused-tuned) tiles can blow
    # Mosaic's scoped-VMEM stack (measured: 68 MB vs the 16 MB limit at
    # DSA-110 fc=4/tt=1024).  Shrink tiles until the double-buffered
    # output block fits; this path is HBM-streaming either way, so tile
    # size is not its perf lever.
    p2b = cfg.n_pol * 2 * cfg.n_beams
    cfg = shrink_tiles(cfg, lambda fc, tt: fc * tt * p2b * 4, 2 ** 21)
    n_terms = len(qw.terms)
    grid = (cfg.n_chan // cfg.chan_tile, cfg.t_block // cfg.time_tile)
    out_shape = jax.ShapeDtypeStruct(
        (cfg.n_chan, cfg.t_block, cfg.n_pol * 2 * cfg.n_beams), jnp.float32
    )
    out_spec = pl.BlockSpec(
        (cfg.chan_tile, cfg.time_tile, cfg.n_pol * 2 * cfg.n_beams),
        lambda f, t: (f, t, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _voltage_kernel,
        n_ant=cfg.n_ant,
        a_compute=cfg.a_compute,
        n_beams=cfg.n_beams,
        n_pol=cfg.n_pol,
        n_terms=n_terms,
        x16=cfg.weight_mode in ("int12", "int13"),
        x_dup=cfg.weight_mode == "int13",
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_common_specs(cfg, n_terms),
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=_cost(
            cfg, n_terms,
            weight_bytes=sum(w.size * w.dtype.itemsize for w in qw.terms),
            out_bytes=out_shape.size * 4,
        ),
        interpret=interpret,
    )(x, *qw.terms, qw.scales[:, None, :])
    return out.reshape(cfg.n_chan, cfg.t_block, cfg.n_pol, 2 * cfg.n_beams)


def voltages_to_complex(bv) -> "jax.Array | object":
    """[F, T, P, 2B] float32 -> [F, T, P, B] complex (test helper).

    NumPy in, NumPy out: complex dtypes must never touch the device
    (some TPU runtimes reject them outright — see ops/cplx.py), so pass
    a host array here (``np.asarray(device_out)`` first).
    """
    import numpy as np

    b = bv.shape[-1] // 2
    if isinstance(bv, np.ndarray):
        return bv[..., :b] + 1j * bv[..., b:]
    return jax.lax.complex(bv[..., :b], bv[..., b:])

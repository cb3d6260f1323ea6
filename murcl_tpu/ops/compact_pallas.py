"""Sub-bag compaction as a one-hot matmul Pallas kernel.

The batched rollout needs ``out[i, f, :] = bank[row_offsets[i] + p, :]``
where ``ranks[i, p] == f`` — i.e. compact each bag's selected patches
(``ranks`` from :func:`murcl_tpu.ops.select.select_ranks`) into a dense
``(B, feat_size, D)`` tensor, zero-padding slots past the selection count.

XLA's route costs ~41 ms/step at the canonical pretrain shape (profiled,
scripts/profile_step.py): a unique-index scatter to invert rank->index
(14.5 ms), a per-row HBM gather whose (8, 128) tiling amplifies traffic
(21.8 ms), and a valid-mask pass (~5 ms). This kernel replaces all three
with, per bag: one contiguous-row DMA of the slide's ``(Nmax, D)`` window
(double-buffered across grid steps — contiguous reads run at HBM speed,
unlike row gathers), a VPU one-hot build ``oh[f, j] = (ranks[j] == f)``,
and an MXU contraction ``out = oh @ rows`` (K=tile matmuls). Rank -1
(unselected / truncated) matches no ``f``, which zero-fills pad slots —
the reference's zero padding (``utils/datasets.py:299-303``) for free.

The bank MUST be over-allocated by ``Nmax`` rows past the last slide
(``murcl_tpu.data.bank`` pads this) so the fixed-size DMA window never
reads out of bounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_compact_xla(bank_feats, row_offsets, ranks, feat_size: int):
    """Golden model: per-bag dynamic slice + one-hot contraction."""
    n_max = ranks.shape[1]
    d = bank_feats.shape[1]

    def one(off, r):
        rows = jax.lax.dynamic_slice(bank_feats, (off, 0), (n_max, d))
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (feat_size, n_max), 0)
            == r[None, :]
        ).astype(rows.dtype)
        return jnp.dot(oh, rows, preferred_element_type=jnp.float32).astype(
            rows.dtype
        )

    return jax.vmap(one)(row_offsets, ranks)


def _make_kernel_resident(n_max: int, tile: int, feat_size: int, d: int,
                          slab: int = 0):
    """One bag per program, whole (n_max, d) window resident in VMEM.

    Faster than the tiled variant (one DMA per bag, no accumulator
    round-trips) but VMEM-bound: only chosen when the double-buffered
    window fits the budget (see :func:`gather_compact`). ``slab != 0``
    selects the banded one-hot contraction (:func:`_banded_slab`), which
    trades the register accumulator for a VMEM scratch with dynamic
    slab-accumulates — opt-in via ``band`` for measurement (the production
    default keeps the full one-hot here; banding earns its keep in the
    tiled variant, where FLOPs otherwise scale with Nmax).
    """
    n_tiles = n_max // tile

    def dma_body(offs8_ref, feats_hbm, rows_buf, sems):
        """Double-buffered whole-window DMA; returns this bag's buffer slot."""
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma(bag, sl):
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(offs8_ref[bag] * 8, n_max), :],
                rows_buf.at[sl], sems.at[sl],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nb)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        return slot

    def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
               rows_buf, sems):
        slot = dma_body(offs8_ref, feats_hbm, rows_buf, sems)

        acc = jnp.zeros((feat_size, d), jnp.float32)
        iota_f = jax.lax.broadcasted_iota(jnp.int32, (feat_size, tile), 0)
        for t in range(n_tiles):
            rows_t = rows_buf[slot, t * tile:(t + 1) * tile, :]
            ranks_t = ranks_ref[0, :, t * tile:(t + 1) * tile]  # (1, tile)
            oh = (iota_f == ranks_t).astype(rows_t.dtype)  # (F, tile)
            acc = acc + jnp.dot(oh, rows_t, preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def kernel_banded(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
                      rows_buf, acc_ref, sems):
        i = pl.program_id(0)
        slot = dma_body(offs8_ref, feats_hbm, rows_buf, sems)

        # banded path: slab-sized one-hot anchored at the running kept
        # count (see _banded_slab); contributions outside [base, base+k_t)
        # are exact zeros, so accumulation matches the full one-hot bitwise
        acc_ref[:] = jnp.zeros_like(acc_ref)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (slab, tile), 0)
        nump = nump_ref[i]
        base = jnp.int32(0)
        for t in range(n_tiles):
            ranks_t = ranks_ref[0, :, t * tile:(t + 1) * tile]  # (1, tile)
            k_t = jnp.sum((ranks_t >= 0).astype(jnp.int32))

            @pl.when(t * tile < nump)
            def _(base=base, ranks_t=ranks_t, t=t):
                base_al = jnp.minimum((base // 128) * 128,
                                      jnp.int32(feat_size - slab))
                start = pl.multiple_of(base_al, 128)
                rows_t = rows_buf[slot, t * tile:(t + 1) * tile, :]
                oh = (iota_s + base_al == ranks_t).astype(rows_t.dtype)
                acc_ref[pl.ds(start, slab), :] += jnp.dot(
                    oh, rows_t, preferred_element_type=jnp.float32)

            base = base + k_t
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)

    return kernel_banded if slab else kernel


def _banded_slab(tile: int, feat_size: int) -> int:
    """Output-slab height for the banded one-hot contraction, or 0.

    Selection ranks are MONOTONE in bank-row order (the reference sorts
    the selected-index union ascending, ``utils/datasets.py:296``, and
    ``select_ranks`` preserves that), so an input tile's kept rows land in
    the contiguous output range ``[base, base + k_t)`` with ``k_t <=
    tile``. A slab of ``tile + 128`` output rows anchored at ``base``
    aligned down to 128 always covers it (``base - base_al <= 127``), so
    the per-tile one-hot matmul shrinks from ``(feat_size, tile)`` to
    ``(slab, tile)``. At the resident regime (Nmax ~2k, 8 tiles) this is
    a measured wash — that kernel is DMA/structure-bound — but in the
    tiled regime (TCGA-scale Nmax ~10k, 26+ live tiles) the full one-hot
    FLOPs scale with Nmax while the band stays constant: measured
    7.50 -> 10.20 steps/sec (+36%) on the TCGA-scale bench. Banding needs
    ``feat_size`` large enough to clamp the slab in-bounds and
    128-divisible for the provable alignment; small feat_size keeps the
    full one-hot (cheap there anyway).
    """
    slab = tile + 128
    # tile must itself be 128-divisible: otherwise feat_size - slab is not
    # 128-aligned and the clamp ``min((base//128)*128, feat_size - slab)``
    # can yield a base that pl.multiple_of(_, 128) falsely promises is
    # aligned — a latent Mosaic miscompile (advisor r3)
    if tile % 128 == 0 and feat_size > slab and feat_size % 128 == 0:
        return slab
    return 0


def _make_kernel_tiled(n_max: int, tile: int, feat_size: int, d: int,
                       slab: int = 0, chunk_tiles: int = 1,
                       gate: bool = False):
    """Streaming compaction over ``grid = (B, n_chunks)``.

    Each grid step DMAs a CHUNK of ``chunk_tiles * tile`` window rows
    (double-buffered) and unrolls the per-tile one-hot contractions over
    it. One tile per step (the original layout) is grid-step-OVERHEAD
    bound: at TCGA scale the (bag, tile) grid walks ~40 steps/bag of
    ~0.26 us of real work against ~1 us/step of fixed cost (measured —
    the whole-kernel time sat ~4x above its DMA+FLOP floor). Multi-tile
    chunks amortize that fixed cost while keeping VMEM at
    O(chunk) << O(Nmax).
    """
    chunk = chunk_tiles * tile
    n_chunks = -(-n_max // chunk)  # ceil: the last chunk may pass n_max

    def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
               rows_buf, acc_ref, base_ref, sems):
        i = pl.program_id(0)
        t = pl.program_id(1)  # chunk index
        nb = pl.num_programs(0)
        li = i * n_chunks + t  # linearized (bag, chunk) step
        slot = jax.lax.rem(li, 2)

        # a (bag, chunk) step is LIVE when its chunk starts before the
        # slide's patch count: later chunks hold only rank=-1 rows, so
        # both their DMA and their matmuls are skipped (real slides vary
        # 10x in patch count; Nmax is the split's maximum). The prefetch
        # site one step earlier recomputes the same predicate from the
        # prefetched scalars, so DMA starts and waits always pair up.
        # The prefetch site evaluates live(nb, 0) on the final grid step;
        # clamp the scalar index explicitly (advisor r4).
        def live(bag, ch):
            return ch * chunk < nump_ref[jnp.minimum(bag, nb - 1)]

        # offsets arrive divided by 8 and are rescaled here: the HBM source
        # is (8, 128)-tiled, and Mosaic must PROVE the slice start is
        # sublane-aligned — `x * 8` is provable, a raw runtime value is not
        # (the bank aligns every slide offset to 8; data/bank.py). chunk is
        # a multiple of 8, so the added chunk offset keeps the proof. The
        # last chunk may read past the slide's window — safe: the bank is
        # over-allocated by Nmax >= chunk rows past the last slide, and
        # rows without a rank entry never enter a contraction.
        def dma(bag, ch, sl):
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(offs8_ref[bag] * 8 + ch * chunk, chunk), :],
                rows_buf.at[sl], sems.at[sl],
            )

        @pl.when((li == 0) & live(0, 0))
        def _():
            dma(0, 0, 0).start()

        nxt_i = jax.lax.div(li + 1, n_chunks)
        nxt_t = jax.lax.rem(li + 1, n_chunks)

        @pl.when((nxt_i < nb) & live(nxt_i, nxt_t))
        def _():
            dma(nxt_i, nxt_t, jax.lax.rem(li + 1, 2)).start()

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            base_ref[0, 0] = 0

        @pl.when(live(i, t))
        def _():
            dma(i, t, slot).wait()
            nump = nump_ref[i] if gate else None
            for j in range(chunk_tiles):
                # tile j of this chunk; window position is t*chunk + j*tile.
                # Default (gate=False): NO data-dependent per-tile gate —
                # dead tiles past the slide's patch count hold only rank=-1
                # rows (select.py pad positions never enter a window), whose
                # one-hot rows are exact zeros, so computing them is
                # golden-exact. The gated `tile_start < nump` pl.when cost
                # 2.8 ms/step at the canonical shape (64 data-dependent
                # branches break Mosaic's pipelining;
                # scripts/dbg_grouped_gate.py: 8.79 -> 6.00 ms) while saving
                # at most chunk_tiles-1 dead-tile matmuls per bag — live()
                # still skips fully-dead chunks (DMA+compute) in ragged
                # regimes. ``gate=True`` (static, ``ragged_gate``) restores
                # the per-tile skip for regimes where dead-tile compute
                # outweighs the branch cost. `tile_start < n_max` is affine
                # in the grid index (last ceil-division chunk), ~free.
                tile_start = t * chunk + j * tile
                pred = (tile_start < n_max) if not gate else \
                    ((tile_start < nump) & (tile_start < n_max))

                @pl.when(pred)
                def _(tile_start=tile_start, j=j):
                    ranks_t = _ranks_slice(ranks_ref, tile_start)
                    rows_t = rows_buf[slot, j * tile:(j + 1) * tile, :]
                    if not slab:
                        iota_f = jax.lax.broadcasted_iota(
                            jnp.int32, (feat_size, tile), 0)
                        oh = (iota_f == ranks_t).astype(rows_buf.dtype)
                        acc_ref[:] += jnp.dot(
                            oh, rows_t, preferred_element_type=jnp.float32)
                    else:
                        # banded slab anchored at the running kept count
                        # (see _banded_slab); base carries across tiles and
                        # chunks in SMEM. Contributions outside
                        # [base, base+k_t) are exact zeros, so accumulation
                        # matches the full one-hot bitwise.
                        base = base_ref[0, 0]
                        base_al = jnp.minimum((base // 128) * 128,
                                              jnp.int32(feat_size - slab))
                        start = pl.multiple_of(base_al, 128)
                        iota_s = jax.lax.broadcasted_iota(
                            jnp.int32, (slab, tile), 0)
                        oh = (iota_s + base_al == ranks_t).astype(
                            rows_buf.dtype)
                        acc_ref[pl.ds(start, slab), :] += jnp.dot(
                            oh, rows_t, preferred_element_type=jnp.float32)
                        base_ref[0, 0] = base + jnp.sum(
                            (ranks_t >= 0).astype(jnp.int32))

        @pl.when(t == n_chunks - 1)
        def _():
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)

    def _ranks_slice(ranks_ref, tile_start):
        # tile_start is a multiple of tile but traced (t is a grid index);
        # the last chunk's tiles can start past n_max only when the guard
        # above already skipped them
        return ranks_ref[0, :, pl.ds(tile_start, tile)]  # (1, tile)

    return kernel


def _make_kernel_grouped(n_max: int, tile: int, feat_size: int, d: int,
                         group: int, b_slides: int, slab: int = 0,
                         chunk_tiles: int = 1, gate: bool = False):
    """Slide-grouped streaming compaction over ``grid = (B//group, n_chunks)``.

    The batched stage-1 layout tiles the same ``b`` slides ``repeat`` times
    (``engine/contrastive.py``: ``jnp.tile(both_ids, T)`` of
    ``concat([ids, ids])`` — every step/view selects from the SAME slide
    window, only the actions differ). The plain tiled kernel therefore
    re-reads each slide window ``repeat`` times — and its ablation
    (``scripts/dbg_compact_ablate.py``) showed the window DMA is 91% of the
    kernel. Here one grid step DMAs a window chunk ONCE and feeds the
    one-hot contractions of ``group`` bags that share the slide: the window
    read shrinks ``group``-fold while FLOPs/output traffic are unchanged.

    Operands are viewed ``(repeat//group, group, b, ...)`` — C-order of the
    flat ``(repeat*b, ...)`` bag axis, so group members are the same slide
    slot ``s`` at flat indices ``(go*group + j)*b + s``. Accumulation
    happens directly in the (revisited) output block in the bank dtype:
    exact, because every output row receives exactly one nonzero
    contribution (ranks are unique per bag) — measured golden-exact as the
    ``bf16acc`` ablation variant.
    """
    chunk = chunk_tiles * tile
    n_chunks = -(-n_max // chunk)

    def kernel(offs8_ref, nump_ref, ranks_ref, feats_hbm, out_ref,
               rows_buf, base_ref, sems):
        gi = pl.program_id(0)  # flat group index: go * b_slides + s
        c = pl.program_id(1)
        ng = pl.num_programs(0)
        li = gi * n_chunks + c
        slot = jax.lax.rem(li, 2)

        nb = ng * group  # flat bag count

        def flat0(g):
            # flat bag index of the group's member 0 (all members share the
            # slide, hence the offset and patch count). The caller-guaranteed
            # layout is validated on eager calls in gather_compact.
            go = jax.lax.div(g, b_slides)
            s = jax.lax.rem(g, b_slides)
            return go * (group * b_slides) + s

        def live(g, ch):
            # the prefetch site evaluates live(ng, 0) on the final grid
            # step; clamp explicitly rather than relying on OOB-index
            # clamping plus the non-short-circuiting `nxt_g < ng` conjunct
            # (advisor r4)
            return ch * chunk < nump_ref[jnp.minimum(flat0(g), nb - 1)]

        def dma(g, ch, sl):
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(offs8_ref[flat0(g)] * 8 + ch * chunk,
                                   chunk), :],
                rows_buf.at[sl], sems.at[sl],
            )

        @pl.when((li == 0) & live(0, 0))
        def _():
            dma(0, 0, 0).start()

        nxt_g = jax.lax.div(li + 1, n_chunks)
        nxt_c = jax.lax.rem(li + 1, n_chunks)

        @pl.when((nxt_g < ng) & live(nxt_g, nxt_c))
        def _():
            dma(nxt_g, nxt_c, jax.lax.rem(li + 1, 2)).start()

        @pl.when(c == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            if slab:
                for j in range(group):
                    base_ref[j, 0] = 0

        @pl.when(live(gi, c))
        def _():
            dma(gi, c, slot).wait()
            nump = nump_ref[flat0(gi)] if gate else None
            for j in range(group):
                for k in range(chunk_tiles):
                    # no data-dependent per-tile gate by default — see the
                    # tiled kernel's comment (dead tiles are all-rank=-1,
                    # exact zeros; the gated pl.when cost 2.8 ms/step here:
                    # scripts/dbg_grouped_gate.py, 8.79 -> 6.00 ms);
                    # gate=True restores the skip for ragged regimes
                    tile_start = c * chunk + k * tile
                    pred = (tile_start < n_max) if not gate else \
                        ((tile_start < nump) & (tile_start < n_max))

                    @pl.when(pred)
                    def _(tile_start=tile_start, j=j, k=k):
                        ranks_t = ranks_ref[0, j, 0, :,
                                            pl.ds(tile_start, tile)]  # (1, tile)
                        rows_t = rows_buf[slot, k * tile:(k + 1) * tile, :]
                        if not slab:
                            iota_f = jax.lax.broadcasted_iota(
                                jnp.int32, (feat_size, tile), 0)
                            oh = (iota_f == ranks_t).astype(rows_buf.dtype)
                            out_ref[0, j, 0] += jnp.dot(
                                oh, rows_t,
                                preferred_element_type=jnp.float32,
                            ).astype(out_ref.dtype)
                        else:
                            base = base_ref[j, 0]
                            base_al = jnp.minimum((base // 128) * 128,
                                                  jnp.int32(feat_size - slab))
                            start = pl.multiple_of(base_al, 128)
                            iota_s = jax.lax.broadcasted_iota(
                                jnp.int32, (slab, tile), 0)
                            oh = (iota_s + base_al == ranks_t).astype(
                                rows_buf.dtype)
                            out_ref[0, j, 0, pl.ds(start, slab), :] += jnp.dot(
                                oh, rows_t,
                                preferred_element_type=jnp.float32,
                            ).astype(out_ref.dtype)
                            base_ref[j, 0] = base + jnp.sum(
                                (ranks_t >= 0).astype(jnp.int32))

    return kernel


def _mix_kernel(perm_ref, lam_ref, x_ref, xp_ref, out_ref):
    # 1-lam in f32: Mosaic cannot legalize scalar bf16 arithmetic
    lam32 = lam_ref[0, 0, 0]
    lam = lam32.astype(x_ref.dtype)
    om = (1.0 - lam32).astype(x_ref.dtype)
    out_ref[0] = lam * x_ref[0] + om * xp_ref[0]


@partial(jax.jit, static_argnames=("interpret",))
def mixup_rows(x, perm_abs, lam, interpret: bool = False):
    """Bag-level mixup as a block-gather kernel: ``lam_i*x_i +
    (1-lam_i)*x[perm_abs[i]]``.

    XLA materializes the permuted copy and splits the mix into several
    full passes over the (B, F, D) bags (~22 ms at the canonical pretrain
    shape); here the partner bag is fetched directly via a scalar-prefetch
    index map — read x twice, write once, nothing else. ``perm_abs`` holds
    ABSOLUTE batch indices (the engine offsets each (step, view) group's
    permutation). Same math as :func:`murcl_tpu.ops.mixup.mixup`.
    """
    b, f, d = x.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, perm: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f, d), lambda i, perm: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # the partner bag: same array, block index taken from the
            # prefetched permutation
            pl.BlockSpec((1, f, d), lambda i, perm: (perm[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, d), lambda i, perm: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mix_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, d), x.dtype),
        interpret=interpret,
    )(perm_abs, lam.reshape(b, 1, 1).astype(jnp.float32), x, x)


# ceiling for the grouped kernel's (group, feat, d) output block, assumed
# 2x-buffered by the pipeline; the rest of the 16 MB scoped VMEM goes to the
# double-buffered window chunks and the ranks block
_GROUP_OUT_BUDGET = 8 * 1024 * 1024


def _pick_group(repeat: int, feat_size: int, d: int, itemsize: int) -> int:
    """Largest divisor of ``repeat`` whose output block fits the budget."""
    for g in range(repeat, 1, -1):
        if repeat % g == 0 and 2 * g * feat_size * d * itemsize <= \
                _GROUP_OUT_BUDGET:
            return g
    return 1


def _gather_compact_grouped(bank_feats, row_offsets, ranks, feat_size: int,
                            num_patches, interpret: bool, tile: int,
                            chunk_tiles: int, repeat: int, group: int,
                            slab: int, gate: bool):
    """Dispatch the slide-grouped tiled kernel (see :func:`gather_compact`)."""
    b, n_max = ranks.shape
    d = bank_feats.shape[1]
    n_tiles = n_max // tile
    b_slides = b // repeat
    rg = repeat // group
    if not chunk_tiles:
        # as much chunk as the VMEM budget allows next to the 2x-buffered
        # output block: chunk granularity DOMINATES the grouped kernel's
        # residual (measured, scripts/dbg_grouped_ablate.py — 8-tile chunks
        # 8.92 ms vs whole-window 6.00 at the canonical shape, while the
        # compare-volume and RMW ablations are washes). ~12 MB total keeps
        # slack under the 16 MB scoped limit.
        budget = 12 * 1024 * 1024 - 2 * group * feat_size * d * \
            bank_feats.dtype.itemsize
        chunk_rows = max(tile, (budget // 2) // (d * bank_feats.dtype.itemsize))
        chunk_tiles = max(1, min(n_tiles, chunk_rows // tile))
    else:
        chunk_tiles = min(chunk_tiles, n_tiles)
    n_chunks = -(-n_tiles // chunk_tiles)
    kernel = _make_kernel_grouped(n_max, tile, feat_size, d, group,
                                  b_slides, slab=slab,
                                  chunk_tiles=chunk_tiles, gate=gate)

    def im(gi, c, offs, nump):
        return (gi // b_slides, 0, gi % b_slides, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rg * b_slides, n_chunks),
        in_specs=[
            pl.BlockSpec((1, group, 1, 1, n_max), im,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # bank stays in HBM
        ],
        out_specs=pl.BlockSpec((1, group, 1, feat_size, d), im,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_tiles * tile, d), bank_feats.dtype),
            pltpu.SMEM((group, 1), jnp.int32),  # banded per-member kept count
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (rg, group, b_slides, feat_size, d), bank_feats.dtype),
        interpret=interpret,
    )(row_offsets // 8, num_patches.astype(jnp.int32),
      ranks.reshape(rg, group, b_slides, 1, n_max), bank_feats)
    return out.reshape(b, feat_size, d)


def gather_compact(bank_feats, row_offsets, ranks, feat_size: int,
                   num_patches=None, interpret: bool = False,
                   variant: str = "auto", band: str = "auto",
                   tile: int = 0, chunk_tiles: int = 0,
                   repeat: int = 1, group: int = 0,
                   ragged_gate: str = "auto"):
    """Compact selected bank rows into ``(B, feat_size, D)`` sub-bags.

    ``bank_feats (P, D)`` (P over-allocated by Nmax rows), ``row_offsets
    (B,)`` int32 — each a multiple of 8 (slide offsets are sublane-aligned
    by the bank builders), ``ranks (B, Nmax)`` int32 with -1 for
    unselected. ``num_patches (B,)`` lets the kernel skip tiles past each
    slide's patch count; omitted it assumes every tile may be live.

    ``band`` selects the banded one-hot contraction (:func:`_banded_slab`):
    ``"auto"`` = banded in BOTH variants when feat_size allows (measured:
    +39% resident kernel at the canonical shape, +36% whole-step at TCGA
    scale); ``"on"``/``"off"`` force it — a static jit key, so measurement
    scripts get distinct compiled programs instead of a silent trace-cache
    hit. ``tile`` overrides the input-tile width (measurement/tuning;
    0 = auto).

    ``repeat`` declares the CALLER-GUARANTEED structure ``B = repeat * b``
    where bag ``m*b + s`` selects from slide slot ``s``'s window for every
    ``m`` (the engines' ``jnp.tile``/``concat`` bag layouts — the batched
    stage-1 rollout repeats each slide T*2 times). With ``repeat > 1`` the
    tiled kernel groups ``group`` same-slide bags per grid step and issues
    their shared window DMA ONCE (:func:`_make_kernel_grouped`): the window
    read — 91% of the plain kernel, measured — shrinks ``group``-fold.
    ``group=0`` auto-picks the largest divisor of ``repeat`` whose output
    block fits the VMEM budget; outputs are bitwise those of the ungrouped
    kernel. Passing ``repeat`` for a bag layout that does NOT repeat slides
    reads the wrong windows — callers own this invariant; eager calls
    (tests, smoke scripts — concrete arrays, not tracers) validate it here
    (advisor r4).

    ``ragged_gate`` (static): per-tile data-dependent skipping of dead
    tiles past each slide's patch count. ``"off"`` = no per-tile gate (dead
    tiles are all-rank=-1, exact zeros — golden-exact either way; the
    gate's 64 branches per grid step cost 2.8 ms at the canonical shape,
    scripts/dbg_grouped_gate.py); ``"on"`` = skip them (wins when dead
    tiles are plentiful: 27.40 vs 30.46 ms at the TCGA shape,
    scripts/dbg_gate_tcga.py). ``"auto"`` picks ``on`` iff Nmax >= 4096
    (over-allocated ragged banks), ``off`` for compact windows.
    """
    if repeat > 1 and not isinstance(row_offsets, jax.core.Tracer):
        import numpy as _np

        offs = _np.asarray(row_offsets)
        if offs.shape[0] % repeat == 0:
            per = offs.reshape(repeat, -1)
            if not (per == per[0]).all():
                raise ValueError(
                    f"repeat={repeat} declares bag m*b+s selects from slide "
                    "slot s's window for every m, but row_offsets differ "
                    "across the repeat axis — the grouped kernel would "
                    "compact from the wrong windows"
                )
            if num_patches is not None and not isinstance(
                    num_patches, jax.core.Tracer):
                nper = _np.asarray(num_patches).reshape(repeat, -1)
                if not (nper == nper[0]).all():
                    raise ValueError(
                        f"repeat={repeat} requires num_patches identical "
                        "across the repeat axis (same slides per slot)"
                    )
    return _gather_compact_jit(
        bank_feats, row_offsets, ranks, feat_size=feat_size,
        num_patches=num_patches, interpret=interpret, variant=variant,
        band=band, tile=tile, chunk_tiles=chunk_tiles, repeat=repeat,
        group=group, ragged_gate=ragged_gate)


@partial(jax.jit, static_argnames=("feat_size", "interpret", "variant",
                                   "band", "tile", "chunk_tiles", "repeat",
                                   "group", "ragged_gate"))
def _gather_compact_jit(bank_feats, row_offsets, ranks, feat_size: int,
                        num_patches=None, interpret: bool = False,
                        variant: str = "auto", band: str = "auto",
                        tile: int = 0, chunk_tiles: int = 0,
                        repeat: int = 1, group: int = 0,
                        ragged_gate: str = "auto"):
    b, n_max = ranks.shape
    d = bank_feats.shape[1]
    if variant not in ("auto", "resident", "tiled"):
        raise ValueError(f"variant must be auto|resident|tiled, got {variant!r}")
    resident = variant == "resident"
    if tile:
        # explicit override (measurement / tuning); must keep the DMA
        # alignment proof (multiple of 8) and divide the window
        if tile % 8 != 0:
            raise ValueError(f"tile must be a multiple of 8, got {tile}")
    elif resident:
        # resident regime prefers the wider tile (11.40 ms at 256 vs 12.13
        # at 128, round 4: its per-tile loop is structure-bound, not
        # FLOP-bound). tile=512 compiles but hits a TPU backend INTERNAL
        # error at runtime (2026-08-17) — do not re-attempt via the
        # override either.
        tile = 256 if n_max % 256 == 0 else 128
    else:
        # chunked tiled default: 128. Multi-tile chunks set the DMA
        # granularity (tile no longer does), so the narrower tile is a pure
        # one-hot-FLOP cut — the banded slab shrinks (tile+128) 384 -> 256,
        # 0.67x MXU work per live row. Measured round 4 at the canonical
        # shape: 9.33 ms vs 9.98 at tile=256, golden-exact. (The round-3
        # "+9.6% at 256" predates chunking, when tile DID set the DMA and
        # grid-step granularity.)
        tile = 128
    if n_max % tile != 0:
        # the grid walks n_max // tile full tiles; a ragged tail would be
        # silently dropped (wrong selections, no error). Bank builders pad
        # max_patches to a multiple of 128 — fail loudly on direct misuse.
        raise ValueError(
            f"gather_compact requires Nmax divisible by {tile} (got {n_max}); "
            "pad the bank's max_patches to a multiple of 128"
        )
    n_tiles = n_max // tile
    if num_patches is None:
        num_patches = jnp.full((b,), n_max, jnp.int32)

    # the chunked tiled kernel is the production default at EVERY size
    # (round 3, scripts/dbg_compact_banded.py): with multi-tile chunks it
    # matches the resident variant's DMA granularity at small windows and
    # beats it outright (10.42 vs 11.86 ms banded at the canonical shape)
    # while keeping VMEM O(chunk), which real slide sizes (Nmax 10k+)
    # require anyway. variant='resident' remains for measurement; its
    # double-buffered whole-window scratch needs the window under ~5 MB
    # (a 7.3 MB f32 window compiled to a 24.4 MB scoped allocation and
    # OOMed the 16 MB VMEM limit — measured)
    in_specs = [
        # (B, 1, Nmax) so the block's last two dims equal the array's
        # (the TPU lowering requires (8, 128)-divisible or full dims)
        pl.BlockSpec((1, 1, n_max),
                     (lambda i, offs, nump: (i, 0, 0)) if resident
                     else (lambda i, t, offs, nump: (i, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # bank stays in HBM
    ]
    out_spec = pl.BlockSpec(
        (1, feat_size, d),
        (lambda i, offs, nump: (i, 0, 0)) if resident
        else (lambda i, t, offs, nump: (i, 0, 0)),
        memory_space=pltpu.VMEM)
    if band not in ("auto", "on", "off"):
        raise ValueError(f"band must be 'auto', 'on' or 'off', got {band!r}")
    slab = _banded_slab(tile, feat_size) if band != "off" else 0
    if band == "on" and not slab:
        raise ValueError(
            f"band='on' needs a feat_size > tile+128 and divisible by 128 "
            f"(got feat_size={feat_size}, tile={tile})"
        )
    if repeat < 1 or b % repeat != 0:
        raise ValueError(f"repeat={repeat} must divide the bag count {b}")
    if group and (repeat % group != 0):
        raise ValueError(f"group={group} must divide repeat={repeat}")
    if group > 1:
        # mirror the auto-pick's VMEM ceiling on explicit overrides: past it
        # the (group, feat, d) output block fails at compile time with an
        # opaque Mosaic VMEM error (the known G=12 12.6 MB failure) —
        # fail loudly instead (advisor r4)
        out_bytes = 2 * group * feat_size * d * bank_feats.dtype.itemsize
        if out_bytes > _GROUP_OUT_BUDGET:
            raise ValueError(
                f"group={group} needs a {out_bytes / 2 ** 20:.1f} MB "
                f"double-buffered output block, past the "
                f"{_GROUP_OUT_BUDGET / 2 ** 20:.0f} MB VMEM budget — "
                f"use group<= {_pick_group(repeat, feat_size, d, bank_feats.dtype.itemsize)}"
            )
    if ragged_gate not in ("auto", "on", "off"):
        raise ValueError(
            f"ragged_gate must be 'auto', 'on' or 'off', got {ragged_gate!r}")
    # per-tile data-dependent skip of dead tiles. The trade has both sides
    # (both measured on v5e, golden-exact):
    #   - canonical shape (Nmax 2048, uniform slides): the gate's 64
    #     data-dependent branches per grid step break Mosaic's pipelining
    #     for 2.8 ms/step while skipping nothing — OFF wins
    #     (scripts/dbg_grouped_gate.py: 8.79 -> 6.00 ms).
    #   - TCGA shape (Nmax 10240, slides 3k-10240): dead tiles past each
    #     slide's patch count are ~1/3 of the window; skipping their
    #     one-hot+matmul waste beats the branch cost — ON wins
    #     (scripts/dbg_gate_tcga.py: 27.40 vs 30.46 ms).
    # Dead-tile compute is golden-exact either way (rank=-1 rows one-hot to
    # exact zeros), and live() always skips fully-dead CHUNKS. 'auto' picks
    # by over-allocation: Nmax >= 4096 means a ragged bank padded to
    # max_patches (dead tiles expected), below it windows are compact.
    gate = (ragged_gate == "on") or (ragged_gate == "auto" and n_max >= 4096)
    if repeat > 1 and not resident:
        g = group or _pick_group(repeat, feat_size, d,
                                 bank_feats.dtype.itemsize)
        if g > 1:
            return _gather_compact_grouped(
                bank_feats, row_offsets, ranks, feat_size, num_patches,
                interpret, tile, chunk_tiles, repeat, g, slab, gate)
    if resident:
        # banded by default here too: round 3 first recorded this as a wash,
        # but that measurement was a jit-cache artifact (the script timed
        # the same program twice); measured properly (band is a static jit
        # key) the banded resident kernel is 11.56 ms vs 18.89 full at the
        # canonical shape (scripts/dbg_compact_banded.py, golden-exact)
        grid: tuple = (b,)
        kernel = _make_kernel_resident(n_max, tile, feat_size, d, slab=slab)
        scratch = [
            pltpu.VMEM((2, n_max, d), bank_feats.dtype),
        ] + ([pltpu.VMEM((feat_size, d), jnp.float32)] if slab else []) + [
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        # multi-tile chunks amortize the ~1 us/grid-step fixed cost (the
        # dominant tiled-kernel cost at one tile/step); ~4 MB of
        # double-buffered window rows leaves headroom under the 16 MB VMEM
        # budget next to the f32 accumulator
        if not chunk_tiles:
            chunk_rows = (4 * 1024 * 1024) // (
                2 * d * bank_feats.dtype.itemsize)
            chunk_tiles = max(1, min(n_tiles, chunk_rows // tile))
        else:
            # an unclamped override would DMA chunk_tiles*tile rows per
            # grid step — past the bank's Nmax over-allocation for the
            # last slide, an out-of-bounds HBM read (advisor r3)
            chunk_tiles = min(chunk_tiles, n_tiles)
        n_chunks = -(-n_tiles // chunk_tiles)
        grid = (b, n_chunks)
        kernel = _make_kernel_tiled(n_max, tile, feat_size, d, slab=slab,
                                    chunk_tiles=chunk_tiles, gate=gate)
        scratch = [
            pltpu.VMEM((2, chunk_tiles * tile, d), bank_feats.dtype),
            pltpu.VMEM((feat_size, d), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),  # banded running kept count
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, feat_size, d), bank_feats.dtype),
        interpret=interpret,
    )(row_offsets // 8, num_patches.astype(jnp.int32),
      ranks.reshape(b, 1, n_max), bank_feats)

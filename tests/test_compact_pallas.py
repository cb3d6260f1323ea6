"""Compaction-matmul kernel vs the select_feats gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from murcl_tpu.data.bank import bank_from_arrays
from murcl_tpu.ops.compact_pallas import gather_compact, gather_compact_xla
from murcl_tpu.ops.select import select_feats, select_ranks

DIM, K = 16, 4


def _bank(rng, batch=6, min_n=10, max_n=120):
    feats, clusters, labels = [], [], []
    for _ in range(batch):
        n = int(rng.integers(min_n, max_n + 1))
        f = rng.normal(size=(n, DIM)).astype(np.float32)
        a = rng.integers(0, K, size=n)
        clusters.append([[int(i) for i in np.where(a == k)[0]] for k in range(K)])
        feats.append(f)
        labels.append(0)
    return feats, clusters, bank_from_arrays(feats, clusters, labels)


@pytest.mark.parametrize("seed,feat_size", [(0, 32), (1, 64), (2, 32)])
def test_ranks_plus_golden_match_select_feats(seed, feat_size):
    """select_ranks + the XLA golden compaction == select_feats exactly,
    including zero padding and truncation."""
    rng = np.random.default_rng(seed)
    feats, clusters, bank = _bank(rng)
    ids = jnp.arange(len(feats), dtype=jnp.int32)
    actions = jnp.asarray(rng.random((len(feats), K)), jnp.float32)

    want = select_feats(
        bank.feats, ids, bank.offsets, bank.num_patches,
        bank.cluster_tables, bank.cluster_sizes, actions,
        feat_size=feat_size, max_patches=bank.max_patches,
        patch_cluster=bank.patch_cluster, patch_pos=bank.patch_pos,
    )
    ranks, row_offs, valid = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=feat_size,
    )
    got = gather_compact_xla(jnp.asarray(bank.feats), row_offs, ranks,
                             feat_size)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # valid mask agrees with the nonzero structure select_feats produces
    assert valid.shape == (len(feats), feat_size)


def test_small_bag_padding_zero_rows():
    """Bags smaller than feat_size: slots past the union count are exact
    zeros (the kernel's rank==-1 no-match)."""
    rng = np.random.default_rng(7)
    feats, clusters, bank = _bank(rng, min_n=6, max_n=20)
    ids = jnp.arange(len(feats), dtype=jnp.int32)
    actions = jnp.asarray(rng.random((len(feats), K)), jnp.float32)
    ranks, row_offs, valid = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=64,
    )
    got = gather_compact_xla(jnp.asarray(bank.feats), row_offs, ranks, 64)
    pad_rows = np.asarray(got)[~np.asarray(valid)]
    np.testing.assert_array_equal(pad_rows, np.zeros_like(pad_rows))


def test_pallas_kernel_matches_golden_interpret():
    """The Pallas kernel (interpret mode) == the XLA golden, f32 and bf16."""
    rng = np.random.default_rng(3)
    feats, clusters, bank = _bank(rng, batch=5, min_n=40, max_n=120)
    ids = jnp.asarray([0, 2, 1, 4, 3], jnp.int32)
    actions = jnp.asarray(rng.random((5, K)), jnp.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        bf = jnp.asarray(bank.feats, dtype)
        ranks, row_offs, _ = select_ranks(
            ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
            jnp.asarray(bank.cluster_sizes), actions,
            jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
            feat_size=32,
        )
        want = gather_compact_xla(bf, row_offs, ranks, 32)
        got = gather_compact(bf, row_offs, ranks, 32, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bank_overallocation_invariant():
    """Banks 8-align every slide offset (provable DMA alignment), reserve
    max_patches rows past the last slide (the kernel's fixed window), and
    keep every pad row exactly zero."""
    rng = np.random.default_rng(11)
    feats, clusters, bank = _bank(rng)
    assert (np.asarray(bank.offsets) % 8 == 0).all()
    last = int(bank.offsets[-1]) + int(bank.num_patches[-1])
    assert bank.feats.shape[0] >= int(bank.offsets[-1]) + bank.max_patches
    np.testing.assert_array_equal(bank.feats[last:], 0.0)
    # inter-slide alignment pad rows are zeros too
    for i in range(bank.num_slides - 1):
        a = int(bank.offsets[i]) + int(bank.num_patches[i])
        b = int(bank.offsets[i + 1])
        np.testing.assert_array_equal(bank.feats[a:b], 0.0)


def test_mixup_rows_matches_mixup_interpret():
    """The block-gather mix kernel == ops.mixup.mixup exactly, per (step,
    view) group with absolute permutation indices, f32 and bf16."""
    from murcl_tpu.ops.compact_pallas import mixup_rows
    from murcl_tpu.ops.mixup import mixup, mixup_factors

    rng = np.random.default_rng(5)
    groups, b, f, d = 3, 4, 8, 16
    keys = jax.random.split(jax.random.PRNGKey(2), groups)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(groups, b, f, d)), dtype)
        want = jnp.stack(
            [mixup(keys[g], x[g], 0.9)[0] for g in range(groups)])
        lams, perms = jax.vmap(lambda k: mixup_factors(k, b, 0.9))(keys)
        base = jnp.arange(groups, dtype=jnp.int32)[:, None] * b
        got = mixup_rows(
            x.reshape(groups * b, f, d),
            (perms.astype(jnp.int32) + base).reshape(-1),
            lams.reshape(-1), interpret=True,
        ).reshape(groups, b, f, d)
        # same math up to rounding: the kernel computes (1-lam) in f32
        # then casts (Mosaic cannot legalize scalar bf16 arithmetic), XLA
        # natively in the bag dtype — one ulp on the weights, plus FMA
        # contraction differences. A wrong permutation or lambda would be
        # O(1) off.
        if dtype == jnp.float32:
            rtol, atol = 5e-5, 1e-6
        else:
            rtol, atol = 1e-2, 1e-2  # one bf16 ulp at |x| ~ 2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=rtol, atol=atol,
        )


def test_pallas_kernel_multi_tile_ragged_interpret():
    """Multi-tile windows with very ragged bags: tile skipping (tiles past
    each slide's patch count) must not change the output."""
    rng = np.random.default_rng(13)
    # Nmax = 768 -> 3 tiles of 256 at DIM features; bags span 30..700
    feats, clusters, bank = _bank(rng, batch=7, min_n=30, max_n=700)
    ids = jnp.asarray([0, 6, 3, 1, 5, 2, 4], jnp.int32)
    actions = jnp.asarray(rng.random((7, K)), jnp.float32)
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=96,
    )
    nump = jnp.asarray(bank.num_patches)[ids]
    want = gather_compact_xla(jnp.asarray(bank.feats), row_offs, ranks, 96)
    for variant in ("resident", "tiled"):
        got = gather_compact(jnp.asarray(bank.feats), row_offs, ranks, 96,
                             num_patches=nump, interpret=True,
                             variant=variant)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=variant)
    # and without the skip hint
    got2 = gather_compact(jnp.asarray(bank.feats), row_offs, ranks, 96,
                          interpret=True, variant="tiled")
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))
    # ragged_gate on/off (static key — distinct programs): the per-tile
    # dead-tile skip must be output-invariant (dead tiles are all rank=-1)
    for mode in ("on", "off"):
        got3 = gather_compact(jnp.asarray(bank.feats), row_offs, ranks, 96,
                              num_patches=nump, interpret=True,
                              variant="tiled", ragged_gate=mode)
        np.testing.assert_array_equal(np.asarray(got3), np.asarray(want),
                                      err_msg=f"ragged_gate={mode}")
    with pytest.raises(ValueError, match="ragged_gate"):
        gather_compact(jnp.asarray(bank.feats), row_offs, ranks, 96,
                       interpret=True, ragged_gate="bogus")



def test_banded_tiled_kernel_matches_golden_interpret():
    """The tiled variant's banded one-hot path (SMEM-carried running kept
    count across the tile grid) == the XLA golden bitwise — incl. small
    bags (dead-tile skip), truncation past feat_size, f32 and bf16."""
    from murcl_tpu.ops.compact_pallas import _banded_slab

    rng = np.random.default_rng(9)
    feats, clusters, bank = _bank(rng, batch=5, min_n=40, max_n=700)
    ids = jnp.asarray([1, 0, 4, 2, 3], jnp.int32)
    actions = jnp.asarray(rng.random((5, K)), jnp.float32)
    feat_size = 512
    assert _banded_slab(128, feat_size) > 0  # banded path is active
    for dtype in (jnp.float32, jnp.bfloat16):
        bf = jnp.asarray(bank.feats, dtype)
        ranks, row_offs, _ = select_ranks(
            ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
            jnp.asarray(bank.cluster_sizes), actions,
            jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
            feat_size=feat_size,
        )
        want = gather_compact_xla(bf, row_offs, ranks, feat_size)
        got = gather_compact(bf, row_offs, ranks, feat_size,
                             num_patches=jnp.asarray(bank.num_patches)[ids],
                             interpret=True, variant="tiled")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_band_flag_forces_variants_interpret():
    """``band='on'/'off'`` force the banded / full one-hot contraction in
    BOTH variants (static jit keys — each is a distinct program); all four
    combinations match the golden bitwise."""
    rng = np.random.default_rng(17)
    feats, clusters, bank = _bank(rng, batch=5, min_n=40, max_n=700)
    ids = jnp.asarray([2, 4, 0, 3, 1], jnp.int32)
    actions = jnp.asarray(rng.random((5, K)), jnp.float32)
    feat_size = 512
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=feat_size,
    )
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    nump = jnp.asarray(bank.num_patches)[ids]
    want = gather_compact_xla(bf, row_offs, ranks, feat_size)
    for variant in ("resident", "tiled"):
        for band in ("on", "off"):
            got = gather_compact(bf, row_offs, ranks, feat_size,
                                 num_patches=nump, interpret=True,
                                 variant=variant, band=band)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=f"{variant}/band={band}")
    with pytest.raises(ValueError, match="band"):
        gather_compact(bf, row_offs, ranks, feat_size, interpret=True,
                       band="bogus")
    with pytest.raises(ValueError, match="feat_size"):
        # feat_size too small for a slab -> band='on' must fail loudly
        gather_compact(bf, row_offs, ranks, 128, interpret=True, band="on")


def test_tiled_chunking_matches_golden_interpret():
    """The chunked tiled kernel (multi-tile DMA + unrolled in-chunk
    contractions) == the golden for every chunk width, including a ragged
    final chunk (n_tiles not divisible by chunk_tiles) and chunks that
    overshoot small bags (dead-tile guard inside a live chunk)."""
    rng = np.random.default_rng(29)
    # Nmax 768 -> 6 tiles of 128; chunk widths walk 1..6 incl. ragged 4, 5
    feats, clusters, bank = _bank(rng, batch=6, min_n=30, max_n=700)
    ids = jnp.asarray([5, 0, 3, 1, 4, 2], jnp.int32)
    actions = jnp.asarray(rng.random((6, K)), jnp.float32)
    feat_size = 512
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=feat_size,
    )
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    nump = jnp.asarray(bank.num_patches)[ids]
    want = gather_compact_xla(bf, row_offs, ranks, feat_size)
    n_tiles = bank.max_patches // 128
    assert n_tiles >= 4
    for chunk_tiles in range(1, n_tiles + 1):
        for band in ("on", "off"):
            got = gather_compact(bf, row_offs, ranks, feat_size,
                                 num_patches=nump, interpret=True,
                                 variant="tiled", band=band, tile=128,
                                 chunk_tiles=chunk_tiles)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=f"chunk_tiles={chunk_tiles} band={band}")


def test_banded_resident_truncation_saturates_base():
    """Heavy truncation: the selection union exceeds feat_size, so late
    tiles' kept counts push the banded anchor past feat_size - slab — the
    clamp (base_al = min(aligned base, feat_size - slab)) must keep the
    slab in-bounds while truncated ranks (-1) contribute nothing."""
    rng = np.random.default_rng(23)
    # large, similar-size bags with feat_size well below the union size
    feats, clusters, bank = _bank(rng, batch=4, min_n=600, max_n=700)
    ids = jnp.asarray([3, 1, 0, 2], jnp.int32)
    actions = jnp.asarray(rng.random((4, K)), jnp.float32)
    feat_size = 512  # slab = tile + 128 = 384 at tile 256 (Nmax 768)
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=feat_size,
    )
    # the scenario only bites when some bag truly truncates
    assert int(jnp.max(jnp.sum(ranks >= 0, axis=1))) == feat_size
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    want = gather_compact_xla(bf, row_offs, ranks, feat_size)
    for variant in ("resident", "tiled"):
        got = gather_compact(bf, row_offs, ranks, feat_size,
                             num_patches=jnp.asarray(bank.num_patches)[ids],
                             interpret=True, variant=variant, band="on")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=variant)


def test_override_guards():
    """Misuse guards on the measurement/tuning overrides (advisor r3):
    non-8-multiple ``tile`` is rejected; a non-128-multiple tile disables
    banding (``band='on'`` then fails loudly instead of letting the slab
    clamp break its own alignment proof); an oversized ``chunk_tiles``
    override is clamped to the window (no out-of-bounds DMA) and stays
    golden-exact; a ragged Nmax/tile split is rejected outright."""
    rng = np.random.default_rng(31)
    feats, clusters, bank = _bank(rng, batch=3, min_n=40, max_n=700)
    ids = jnp.asarray([0, 2, 1], jnp.int32)
    actions = jnp.asarray(rng.random((3, K)), jnp.float32)
    feat_size = 512
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=feat_size,
    )
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    nump = jnp.asarray(bank.num_patches)[ids]
    want = gather_compact_xla(bf, row_offs, ranks, feat_size)

    with pytest.raises(ValueError, match="multiple of 8"):
        gather_compact(bf, row_offs, ranks, feat_size, interpret=True,
                       tile=12)
    # 8-multiple but not 128-multiple: legal only with banding off
    # (the banded slab's alignment proof needs tile % 128 == 0)
    with pytest.raises(ValueError, match="band"):
        gather_compact(bf, row_offs, ranks, feat_size, interpret=True,
                       variant="resident", tile=8, band="on")
    with pytest.raises(ValueError, match="divisible"):
        # Nmax not divisible by the tile override
        gather_compact(bf, row_offs, ranks, feat_size, interpret=True,
                       tile=ranks.shape[1] - 8)
    # oversized chunk_tiles override: clamped to n_tiles, result exact
    got = gather_compact(bf, row_offs, ranks, feat_size, num_patches=nump,
                         interpret=True, variant="tiled", tile=128,
                         chunk_tiles=9999)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grouped_kernel_matches_golden_interpret():
    """The slide-grouped kernel (``repeat``/``group``) == the XLA golden,
    bitwise, with the engine's exact bag layout: the same slides tiled
    ``repeat`` times with per-occurrence actions (``jnp.tile(both_ids, T)``,
    engine/contrastive.py), ragged patch counts, banded and full one-hot,
    every divisor group size, f32 and bf16 banks."""
    rng = np.random.default_rng(17)
    feats, clusters, bank = _bank(rng, batch=3, min_n=40, max_n=700)
    repeat, feat_size = 4, 512
    ids = jnp.asarray(np.tile([0, 2, 1], repeat), jnp.int32)  # (m, s)-major
    actions = jnp.asarray(rng.random((len(ids), K)), jnp.float32)
    for dtype in (jnp.bfloat16, jnp.float32):
        bf = jnp.asarray(bank.feats, dtype)
        ranks, row_offs, _ = select_ranks(
            ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
            jnp.asarray(bank.cluster_sizes), actions,
            jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
            feat_size=feat_size,
        )
        nump = jnp.asarray(bank.num_patches)[ids]
        want = gather_compact_xla(bf, row_offs, ranks, feat_size)
        for group in (2, 4):
            for band in ("on", "off"):
                got = gather_compact(bf, row_offs, ranks, feat_size,
                                     num_patches=nump, interpret=True,
                                     variant="tiled", band=band,
                                     repeat=repeat, group=group)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"{dtype.__name__} group={group} band={band}")
        # ragged_gate='on' (per-tile dead-tile skip) stays bitwise in the
        # grouped kernel too
        got = gather_compact(bf, row_offs, ranks, feat_size,
                             num_patches=nump, interpret=True,
                             variant="tiled", repeat=repeat, group=2,
                             ragged_gate="on")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"{dtype.__name__} gate=on")
    # auto group pick engages and stays exact
    got = gather_compact(bf, row_offs, ranks, feat_size, num_patches=nump,
                         interpret=True, repeat=repeat)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grouped_kernel_guards_and_autopick():
    """``repeat`` must divide the bag count, ``group`` must divide
    ``repeat``; the auto pick respects the output-block VMEM budget and
    falls back to the ungrouped kernel when no divisor fits."""
    from murcl_tpu.ops.compact_pallas import _GROUP_OUT_BUDGET, _pick_group

    rng = np.random.default_rng(23)
    feats, clusters, bank = _bank(rng, batch=2, min_n=40, max_n=200)
    ids = jnp.asarray([0, 1, 0, 1], jnp.int32)
    actions = jnp.asarray(rng.random((4, K)), jnp.float32)
    ranks, row_offs, _ = select_ranks(
        ids, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=32,
    )
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    with pytest.raises(ValueError, match="repeat"):
        gather_compact(bf, row_offs, ranks, 32, interpret=True, repeat=3)
    with pytest.raises(ValueError, match="group"):
        gather_compact(bf, row_offs, ranks, 32, interpret=True, repeat=2,
                       group=4)
    # budget math: largest divisor whose 2x-buffered block fits
    assert _pick_group(12, 1024, 512, 2) == 4
    assert _pick_group(12, 1024, 512, 4) == 2
    assert _pick_group(2, 1024, 512, 2) == 2
    # a block too big for any divisor -> 1 (ungrouped fallback, still exact)
    big = _GROUP_OUT_BUDGET  # feat*d*itemsize alone exceeds budget/2
    assert _pick_group(12, big, 1, 1) == 1
    got = gather_compact(bf, row_offs, ranks, 32, interpret=True, repeat=2)
    want = gather_compact_xla(bf, row_offs, ranks, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grouped_layout_and_budget_guards():
    """Advisor-r4 guards: an eager (non-traced) call with ``repeat`` whose
    bag layout does NOT actually tile the same slides is rejected instead
    of silently compacting from member 0's windows; a num_patches mismatch
    across the repeat axis is rejected too; an explicit ``group`` override
    whose output block exceeds the VMEM budget fails loudly at dispatch
    instead of as an opaque Mosaic compile error."""
    rng = np.random.default_rng(41)
    feats, clusters, bank = _bank(rng, batch=4, min_n=40, max_n=200)
    ids_bad = jnp.asarray([0, 1, 2, 3], jnp.int32)  # repeat=2 but 4 slides
    actions = jnp.asarray(rng.random((4, K)), jnp.float32)
    ranks, row_offs, _ = select_ranks(
        ids_bad, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=32,
    )
    bf = jnp.asarray(bank.feats, jnp.bfloat16)
    with pytest.raises(ValueError, match="wrong windows"):
        gather_compact(bf, row_offs, ranks, 32, interpret=True, repeat=2)
    # valid offsets but inconsistent num_patches across the repeat axis
    ids_ok = jnp.asarray([0, 1, 0, 1], jnp.int32)
    ranks2, row_offs2, _ = select_ranks(
        ids_ok, jnp.asarray(bank.offsets), jnp.asarray(bank.num_patches),
        jnp.asarray(bank.cluster_sizes), actions,
        jnp.asarray(bank.patch_cluster), jnp.asarray(bank.patch_pos),
        feat_size=32,
    )
    bad_nump = jnp.asarray(bank.num_patches)[jnp.asarray([0, 1, 2, 3])]
    with pytest.raises(ValueError, match="num_patches"):
        gather_compact(bf, row_offs2, ranks2, 32, interpret=True, repeat=2,
                       num_patches=bad_nump)
    # explicit over-budget group: the known G=12 failure shape (bf16,
    # feat 1024, d 512 -> 12.6 MB double-buffered output block)
    rng2 = np.random.default_rng(43)
    feats2, clusters2, bank2 = _bank(rng2, batch=1, min_n=40, max_n=200)
    ids12 = jnp.asarray([0] * 12, jnp.int32)
    actions12 = jnp.asarray(rng2.random((12, K)), jnp.float32)
    ranks12, row_offs12, _ = select_ranks(
        ids12, jnp.asarray(bank2.offsets), jnp.asarray(bank2.num_patches),
        jnp.asarray(bank2.cluster_sizes), actions12,
        jnp.asarray(bank2.patch_cluster), jnp.asarray(bank2.patch_pos),
        feat_size=128,
    )
    bf2 = jnp.asarray(np.zeros((bank2.feats.shape[0], 512)), jnp.bfloat16)
    with pytest.raises(ValueError, match="VMEM budget"):
        gather_compact(bf2, row_offs12, ranks12, 1024, interpret=True,
                       repeat=12, group=12)

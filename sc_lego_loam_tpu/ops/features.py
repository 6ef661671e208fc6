"""Edge/planar feature extraction (reference C8: featureAssociation.cpp:621-784).

The reference sorts each ring section by curvature and walks it sequentially,
suppressing +-5 neighbors after each pick.  The TPU-native reformulation is
*vectorized sequential argmax*: all (ring x section) slots pick their next
best candidate simultaneously (k small, bounded iterations), applying the
same +-5 neighbor suppression with the column-gap guard via gathers/scatters.
Cross-section suppression bleed (a pick near a section boundary suppressing
candidates in the *next* section processed later) is the only tie-breaking
difference vs the reference — allowed per SURVEY.md par.7 "exact-enough
semantics".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CapacityConfig, FeatureConfig
from .compaction import SegmentedCloud
from .voxel import voxel_downsample


class FeatureCloud(NamedTuple):
    """Padded feature list."""

    xyz: jnp.ndarray       # (P,3)
    mask: jnp.ndarray      # (P,) bool
    ring: jnp.ndarray      # (P,) int32 — scan ring (for ring-window matching)
    rel_time: jnp.ndarray  # (P,) intra-scan relative time in [0,1)


class FeatureSet(NamedTuple):
    sharp: FeatureCloud        # <=2/section edges         (label 2)
    less_sharp: FeatureCloud   # <=20/section edges        (label >=1)
    flat: FeatureCloud         # <=4/section ground planes (label -1)
    less_flat: FeatureCloud    # everything label<=0, voxel-DS 0.2


def curvature(cloud: SegmentedCloud, feat: FeatureConfig, neighbor_mask=None):
    """c[i] = (sum_{1<=|l|<=5} r[i+l] - 10 r[i])^2 over compacted ring order
    (featureAssociation.cpp:621-641). Returns (curv, curv_valid).

    ``neighbor_mask`` (H,W bool, optional): neighbors outside the mask
    contribute zero range difference.  Used for the ground/flat test: the
    compacted order interleaves every-5th ground points with cluster points,
    so an unmasked window crossing a ground<->cluster boundary sees a
    multi-meter range jump and poisons the curvature of *every* ground point
    within +-k of a boundary (on short ground runs that is all of them).
    Masking restricts the planarity test to ground-vs-ground differences,
    which matches the reference's long-contiguous-ground behavior."""
    r = cloud.rng
    H, W = r.shape
    k = feat.curvature_halfwidth
    if neighbor_mask is None:
        acc = -2.0 * k * r
        for l in range(1, k + 1):
            acc = acc + jnp.roll(r, l, 1) + jnp.roll(r, -l, 1)
    else:
        acc = jnp.zeros_like(r)
        for l in range(1, k + 1):
            for sh in (l, -l):
                nb_ok = jnp.roll(neighbor_mask, sh, 1)
                acc = acc + jnp.where(nb_ok, jnp.roll(r, sh, 1) - r, 0.0)
    curv = acc * acc
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (pos >= k) & (pos <= cloud.count[:, None] - 1 - k) & cloud.valid
    return curv, ok


def occlusion_mask(cloud: SegmentedCloud, feat: FeatureConfig) -> jnp.ndarray:
    """Occluded / parallel-beam pixels to exclude from picking
    (featureAssociation.cpp:643-678). Returns (H,W) bool 'pre-picked'."""
    r = cloud.rng
    H, W = r.shape
    col = cloud.col
    nxt_r = jnp.roll(r, -1, 1)
    nxt_c = jnp.roll(col, -1, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    pair_ok = (pos + 1 < cloud.count[:, None])
    close_cols = (jnp.abs(nxt_c - col) < feat.occlusion_col_gap) & pair_ok
    # i occludes: depth1 - depth2 > 0.3 -> mark [i-5, i]
    a = close_cols & (r - nxt_r > feat.occlusion_range_gap)
    # next occludes: depth2 - depth1 > 0.3 -> mark [i+1, i+6]
    b = close_cols & (nxt_r - r > feat.occlusion_range_gap)
    marked = jnp.zeros((H, W), bool)
    for l in range(0, 6):
        marked |= jnp.roll(a, -l, 1)          # j marked if a[j+l], l in 0..5
    for l in range(1, 7):
        marked |= jnp.roll(b, l, 1)           # j marked if b[j-l], l in 1..6
    # Parallel beams (fA.cpp:668-676).
    prv_r = jnp.roll(r, 1, 1)
    diff1 = jnp.abs(prv_r - r)
    diff2 = jnp.abs(nxt_r - r)
    par = (diff1 > feat.parallel_beam_ratio * r) & \
          (diff2 > feat.parallel_beam_ratio * r)
    marked |= par
    return marked & cloud.valid


def _suppress_positions(col, idx, count, feat: FeatureConfig):
    """Positions to mark picked around a pick at ``idx`` (per ring), honoring
    the column-gap early stop (fA.cpp:720-732).

    col: (H,W); idx: (H,S) pick position per section; returns
    (positions (H,S,11) int32, mask (H,S,11) bool)."""
    H, W = col.shape
    S = idx.shape[1]
    offs = jnp.arange(-feat.suppress_halfwidth, feat.suppress_halfwidth + 1)
    pos = idx[..., None] + offs                           # (H,S,11)
    pos_c = jnp.clip(pos, 0, W - 1)
    colg = jax.vmap(lambda c, p: c[p])(col, pos_c.reshape(H, -1)).reshape(
        H, S, -1)
    # Gap between consecutive offsets moving away from the center.
    gaps = jnp.abs(jnp.diff(colg, axis=-1))               # (H,S,10)
    kh = feat.suppress_halfwidth
    ok = jnp.ones(pos.shape, bool)
    # Right side: offset l (1..5) allowed iff all gaps center..l <= 10.
    right_ok = jnp.cumprod(
        (gaps[..., kh:] <= feat.suppress_col_gap).astype(jnp.int32),
        axis=-1).astype(bool)                             # (H,S,5)
    # Left side: offset -l allowed iff gaps center..-l <= 10.
    left_gaps = gaps[..., :kh][..., ::-1]
    left_ok = jnp.cumprod(
        (left_gaps <= feat.suppress_col_gap).astype(jnp.int32),
        axis=-1).astype(bool)[..., ::-1]                  # (H,S,5)
    ok = ok.at[..., kh + 1:].set(right_ok)
    ok = ok.at[..., :kh].set(left_ok)
    in_row = (pos >= 0) & (pos < count[:, None, None])
    return pos_c, ok & in_row


def _onehot_mark(W, pos, mask):
    """Scatter ``mask`` at columns ``pos``: out[h,w] = any_{s,o}
    (pos[h,s,o]==w & mask[h,s,o]).  One tiny scatter per ring, vmapped over
    rings (H-way parallel; each scatter is ~S*O updates) — ~4x cheaper than
    the dense (H,S,O,W) broadcast-compare this replaces, which burned
    ~4 MB of VPU compares per call inside the feature-picking fori_loop.
    pos/mask: (H,S,O) -> (H,W) bool."""
    H = pos.shape[0]
    flat_pos = pos.reshape(H, -1)
    flat_mask = mask.reshape(H, -1)
    return jax.vmap(
        lambda p, m: jnp.zeros((W,), bool).at[jnp.where(m, p, W)].set(
            True, mode="drop")
    )(flat_pos, flat_mask)


def _greedy_pick(pos, has, chain_id, feat: FeatureConfig):
    """Greedy pick-and-suppress on a per-section candidate list.

    Candidates come rank-sorted (best first, from top_k).  Candidate r is
    picked iff no better already-picked candidate sits within
    +-suppress_halfwidth compacted positions on an unbroken column-gap
    chain — the reference's sequential walk (fA.cpp:699-769) restated on
    the candidate set: "all consecutive gaps between p and q <=
    suppress_col_gap" is equivalent to equal prefix-sums of gap breaks
    (``chain_id``).  The loop runs over the tiny (H,S,KC) candidate tensor
    instead of the full (H,S,W) grid that the round-based implementation
    swept once per pick (24 full-grid argmax+scatter rounds -> ~40
    micro-ops).  Returns picked (H,S,KC) bool.
    """
    KC = pos.shape[-1]
    near = jnp.abs(pos[..., :, None] - pos[..., None, :]) \
        <= feat.suppress_halfwidth
    same_chain = chain_id[..., :, None] == chain_id[..., None, :]
    M = near & same_chain & has[..., :, None] & has[..., None, :]
    picked = jnp.zeros(pos.shape, bool).at[..., 0].set(has[..., 0])
    for r in range(1, KC):
        supp = (picked[..., :r] & M[..., :r, r]).any(-1)
        picked = picked.at[..., r].set(has[..., r] & ~supp)
    return picked


def _scatter_label(label, pos, flag, val):
    """label[h, pos[h,s,c]] <- val where flag (per ring, tiny scatters)."""
    H, W = label.shape
    p = pos.reshape(H, -1)
    f = flag.reshape(H, -1)
    upd = jax.vmap(
        lambda pr, fr: jnp.zeros((W,), jnp.int8).at[
            jnp.where(fr, pr, W)].max(jnp.int8(1), mode="drop")
    )(p, f).astype(bool)
    return jnp.where(upd, jnp.int8(val), label)


def extract(cloud: SegmentedCloud, feat: FeatureConfig,
            cap: CapacityConfig, sparse_picks: bool = True) -> FeatureSet:
    """``sparse_picks=False`` (the dense-query engine configuration,
    OdometryConfig.joint_6dof + dense_queries) skips everything only the
    reference's SPARSE pick sets consume — the ground-masked curvature
    pass, surf top-k + greedy pick, edge-pick suppression zones, and the
    sharp/flat compactions (~3 ms/scan of latency-bound micro-ops on
    TPU): the dense path matches with less_sharp/less_flat exclusively
    and sharp/flat come back empty."""
    H, W = cloud.rng.shape
    S = feat.sections
    curv, curv_ok = curvature(cloud, feat)
    occl = occlusion_mask(cloud, feat)

    n = jnp.maximum(cloud.count, 1)                        # (H,)
    # Sections are CONTIGUOUS spans of the compacted row (fA.cpp:691-694:
    # [s*n/S, (s+1)*n/S)): candidate scoring gathers each section's fixed-
    # size window instead of masking an (H,S,W) broadcast — the top_k then
    # sorts 6x less data (the window is <= ceil(W/S) long).
    SEC_L = -(-W // S) + 1
    sec_start = (jnp.arange(S)[None, :] * n[:, None]) // S     # (H,S)
    sec_end = ((jnp.arange(S)[None, :] + 1) * n[:, None]) // S
    sec_off = jnp.arange(SEC_L)
    sec_pos = jnp.clip(sec_start[..., None] + sec_off, 0, W - 1)  # (H,S,L)
    sec_in = sec_off[None, None, :] < (sec_end - sec_start)[..., None]

    # Column-gap chain ids: suppression never crosses a compacted-neighbor
    # gap > suppress_col_gap (fA.cpp:720-732); equal prefix-sum of breaks
    # <=> unbroken chain between two positions.
    brk = jnp.abs(cloud.col - jnp.roll(cloud.col, 1, 1)) > feat.suppress_col_gap
    brk = brk.at[:, 0].set(False)
    chain = jnp.cumsum(brk.astype(jnp.int32), axis=1)      # (H,W)

    def gather_row(a, idx):
        return jax.vmap(lambda ar, ir: ar[ir])(
            a, idx.reshape(H, -1)).reshape(idx.shape)

    NEG = jnp.float32(-1.0)

    # ---- edge picks: one top-KC pass + greedy suppression ----
    # > edge_less_per_section; headroom for suppressed candidates
    KC = min(32, SEC_L - 1)
    cand = curv_ok & ~occl & (curv > feat.edge_threshold) & ~cloud.ground
    score_r = jnp.where(cand, curv, NEG)                   # (H,W)
    score = jnp.where(sec_in, gather_row(score_r, sec_pos), NEG)
    val, sel = jax.lax.top_k(score, KC)                    # (H,S,KC) desc
    pos = jnp.take_along_axis(sec_pos, sel, -1)
    has = val > 0.0
    picked = _greedy_pick(pos, has, gather_row(chain, pos), feat)
    rank = jnp.cumsum(picked.astype(jnp.int32), -1)
    sharp_f = picked & (rank <= feat.edge_per_section)
    less_f = picked & (rank <= feat.edge_less_per_section)

    label = jnp.zeros((H, W), jnp.int8)
    label = _scatter_label(label, pos, less_f, 1)

    rings = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def gather_class(mask, pad):
        from .compact import compact_indices
        m = mask.reshape(-1)
        idx, ok = compact_indices(m, pad)
        return FeatureCloud(
            xyz=jnp.where(ok[:, None], cloud.xyz.reshape(-1, 3)[idx], 0.0),
            mask=ok,
            ring=jnp.where(ok, rings.reshape(-1)[idx], 0),
            rel_time=jnp.where(ok, cloud.rel_time.reshape(-1)[idx], 0.0),
        )

    def empty(pad):
        return FeatureCloud(
            xyz=jnp.zeros((pad, 3), jnp.float32),
            mask=jnp.zeros((pad,), bool),
            ring=jnp.zeros((pad,), jnp.int32),
            rel_time=jnp.zeros((pad,), jnp.float32))

    if sparse_picks:
        label = _scatter_label(label, pos, sharp_f, 2)

        # Suppression zones of the edge picks, for the surf phase.
        spos, smask = _suppress_positions(cloud.col, pos.reshape(H, -1),
                                          cloud.count, feat)
        smask &= less_f.reshape(H, -1)[..., None]
        supp_map = _onehot_mark(W, spos, smask)

        # ---- surf picks ----
        # Ground planarity judged against ground neighbors only (see
        # curvature).  Ground is exempt from the occlusion/parallel-beam
        # pre-mask: ground is the lowest surface, so an apparent range
        # discontinuity at a ground pixel is an artifact of the
        # every-5th-ground compaction interleaving (fA.cpp marks +-5
        # compacted neighbors around any jump, which on short ground runs
        # pre-picks ALL of them).  Pick-suppression marks still apply.
        gcurv, _ = curvature(cloud, feat,
                             neighbor_mask=cloud.ground & cloud.valid)
        KS = min(8, SEC_L - 1)
        _BIG_F = jnp.float32(1e18)
        excl = supp_map | (occl & ~cloud.ground)
        cand_s = curv_ok & ~excl & (gcurv < feat.surf_threshold) & \
            cloud.ground
        score_sr = jnp.where(cand_s, -gcurv, -_BIG_F)      # (H,W)
        score_s = jnp.where(sec_in, gather_row(score_sr, sec_pos), -_BIG_F)
        val_s, sel_s = jax.lax.top_k(score_s, KS)
        pos_s = jnp.take_along_axis(sec_pos, sel_s, -1)
        has_s = val_s > -_BIG_F * 0.5
        picked_s = _greedy_pick(pos_s, has_s, gather_row(chain, pos_s),
                                feat)
        rank_s = jnp.cumsum(picked_s.astype(jnp.int32), -1)
        flat_f = picked_s & (rank_s <= feat.surf_per_section)
        neg = _scatter_label(jnp.zeros((H, W), jnp.int8), pos_s, flat_f, 1)
        label = jnp.where(neg.astype(bool) & (label == 0), jnp.int8(-1),
                          label)
        sharp = gather_class(label == 2, cap.sharp_pad)
        flat = gather_class(label == -1, cap.flat_pad)
    else:
        sharp = empty(cap.sharp_pad)
        flat = empty(cap.flat_pad)

    less_sharp = gather_class(label >= 1, cap.less_sharp_pad)

    # Less-flat: every in-range point not picked as an edge
    # (fA.cpp:771-782 cloudLabel <= 0), voxel-decimated at 0.2 m (ONE
    # representative return per voxel: the set is an NN target/query
    # bank, where PCL-style centroids buy nothing over a real return —
    # and the winner's ring/rel_time channels stay exact instead of
    # voxel-averaged).
    lf_mask = curv_ok & (label <= 0)
    pts = cloud.xyz.reshape(-1, 3)
    from .voxel import voxel_decimate
    ds_pts, ds_mask, ds_idx = voxel_decimate(
        pts, lf_mask.reshape(-1), feat.less_flat_leaf, cap.less_flat_pad,
        table_bits=18, return_indices=True)
    less_flat = FeatureCloud(
        xyz=ds_pts, mask=ds_mask,
        ring=jnp.where(ds_mask, rings.reshape(-1)[ds_idx], 0),
        rel_time=jnp.where(ds_mask, cloud.rel_time.reshape(-1)[ds_idx],
                           0.0),
    )
    return FeatureSet(sharp=sharp, less_sharp=less_sharp, flat=flat,
                      less_flat=less_flat)

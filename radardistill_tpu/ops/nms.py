"""Fixed-capacity rotated NMS, on-device.

TPU-native replacement for the reference's 64-bit-bitmask CUDA NMS
(reference: pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu nms_gpu;
python wrapper iou3d_nms_utils.py:122-146; call site
pcdet/models/model_utils/model_nms_utils.py:6-25).

Instead of dynamic keep-lists, everything is fixed shape: the caller supplies
K = NMS_PRE_MAXSIZE padded boxes + validity, we compute the (K, K) rotated
BEV IoU matrix once (VPU-friendly), then run a sequential suppression scan
(lax.fori_loop over K with O(K) vector work per step). Output is a fixed
(post_max,) index buffer + validity mask — no host synchronisation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry


def class_agnostic_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    nms_thresh: float,
    pre_max: int,
    post_max: int,
    score_thresh: float | None = None,
):
    """Rotated BEV-IoU NMS over a fixed-size candidate set.

    Args:
        boxes: (N, 7+) candidate boxes [x,y,z,dx,dy,dz,heading,...].
        scores: (N,) scores (already rectified if applicable).
        valid: (N,) bool — padding mask.
        nms_thresh: IoU suppression threshold.
        pre_max: NMS_PRE_MAXSIZE — top-k kept before NMS.
        post_max: NMS_POST_MAXSIZE — output capacity.
        score_thresh: optional score gate applied before NMS.

    Returns:
        (sel_idx, sel_valid): (post_max,) indices into the input arrays and a
        bool validity mask. Matches reference semantics: top-`pre_max` by
        score, suppress IoU>thresh against higher-scored kept boxes, keep the
        first `post_max` survivors in score order.
    """
    n = boxes.shape[0]
    k = min(pre_max, n)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    if score_thresh is not None:
        s = jnp.where(scores > score_thresh, s, neg_inf)

    top_scores, order = jax.lax.top_k(s, k)  # (k,)
    cand_valid = top_scores > neg_inf
    cand_boxes = boxes[order]

    iou = geometry.boxes_iou_bev(cand_boxes[:, :7], cand_boxes[:, :7])  # (k, k)
    overlaps = (iou > nms_thresh) & cand_valid[None, :] & cand_valid[:, None]
    # sup[i, j] = True iff j (higher-ranked) can suppress i: lower triangle
    sup = overlaps & (jnp.arange(k)[:, None] > jnp.arange(k)[None, :])

    # Exact greedy suppression as a monotone fixed point: iterate
    #   alive[i] <- valid[i] & no alive higher-ranked box overlaps i
    # The greedy keep-set is the unique fixed point (induction over rank);
    # convergence takes <= longest suppression-chain length iterations
    # (typically < 10). Each iteration is one (k,k)x(k,) MXU matvec — the
    # predicate any-reduce over the sublane axis it replaces measured
    # ~2.4 ms/iteration at k=500 (r2 inference profile).
    sup_f = sup.astype(jnp.float32)

    def cond(carry):
        alive, prev_changed = carry
        return prev_changed

    def body(carry):
        alive, _ = carry
        suppressed = (sup_f @ alive.astype(jnp.float32)) > 0
        new_alive = cand_valid & ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    keep, _ = jax.lax.while_loop(cond, body, (cand_valid, jnp.bool_(True)))

    # compact kept candidates to the front (stable), then cut to post_max
    rank = jnp.where(keep, jnp.arange(k), k)
    perm = jnp.argsort(rank)[:post_max]
    sel_valid = keep[perm]
    sel_idx = order[perm]
    return sel_idx, sel_valid

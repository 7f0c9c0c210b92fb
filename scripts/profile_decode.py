"""Stage-wise profile of the serving decode path (fwd + decode_detections).

Locates where the decode tail's milliseconds go so the optimization is
targeted rather than guessed (BENCHMARK.md round-3 item: push serving past
4,500 img/s).  Stages, each measured under the honest chained protocol
(BENCHMARK.md "measurement integrity": executions chained in one jit via a
data dependency, completion forced by host readback, per-iteration time is
the slope between two chain lengths):

  * forward only (eval mode) — the non-decode baseline;
  * forward + full decode — the serving headline path;
  * decode only, on fixed raw predictions;
  * decode sub-stages on fixed (scores, boxes):
      - raw-offset -> corner-box transform (decode_raw_predictions)
      - candidate pool selection (shared selector's (B, n) top-k + gathers)
      - per-class top-k over the pool ((B, C, M) sort)
      - Pallas NMS over the (B*C, k) candidates
      - final global top-k + row assembly

Usage: python scripts/profile_decode.py [--batch 32] [--chain 20]
       [--selector shared] [--pool 1024] [--nms-k 400]
Prints one JSON object per measurement and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.profile_train_step import chained_seconds  # slope protocol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--selector", default="shared",
                    choices=["shared", "exact", "approx"])
    ap.add_argument("--pool", type=int, default=1024)
    ap.add_argument("--nms-k", type=int, default=400)
    ap.add_argument("--pool-impl", default="sort", choices=["sort", "approx"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.boxes.decode import (
        decode_raw_predictions,
    )
    from jpeg_detection_resnet_ssd_tpu.models import (
        build_model,
        make_inference_fn,
    )

    B = args.batch
    module, _ = build_model("ssd300_ssd_custom", n_classes=20,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 100, (B, 38, 38, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 30, (B, 19, 19, 128)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), (y[:1], cbcr[:1]),
                            train=False)
    decode = make_inference_fn(
        n_classes=20, spec=AnchorSpec(),
        candidate_selector=args.selector,
        shared_pool_size=args.pool,
        nms_max_output_size=args.nms_k,
        pool_topk_impl=args.pool_impl,
    )

    results = {}

    def record(name, seconds):
        results[name] = seconds * 1e3
        print(json.dumps({"component": name,
                          "ms_per_batch": round(seconds * 1e3, 3),
                          "img_per_s": round(B / seconds, 1)}), flush=True)

    # 1) forward only (eval mode)
    def fwd(c):
        out = module.apply(variables, (c, cbcr), train=False)
        return c + jnp.sum(out).astype(jnp.float32) * 1e-12

    record("forward_eval", chained_seconds(fwd, y, args.chain))

    # 2) forward + full decode (the serving path)
    def fwd_decode(c):
        preds = module.apply(variables, (c, cbcr), train=False)
        out = decode(preds.astype(jnp.float32))
        return c + jnp.sum(out[:, :, 1]) * 1e-9

    record("forward_plus_decode", chained_seconds(fwd_decode, y, args.chain))

    # 3) decode only, on fixed raw predictions.  Random-init activations are
    # huge (|preds| up to ~2.6e5), so exp() in the offset transform overflows
    # to inf; scale the fixed tensor down — stage COST is value-independent
    # (fixed-trip-count loops and sorts), only finiteness matters for the
    # chained accumulator.
    preds = module.apply(variables, (y, cbcr), train=False).astype(
        jnp.float32
    ) * 1e-3

    def decode_only(c):
        p, acc = c
        out = decode(p + acc * 1e-20)
        return (p, acc + jnp.sum(out[:, :, 1]) * 1e-9)

    record("decode_only", chained_seconds(
        decode_only, (preds, jnp.float32(0)), args.chain * 2))

    # 4) sub-stages on fixed tensors
    C = 20
    conf_thresh = 0.01
    scores, boxes = decode_raw_predictions(
        preds, img_height=300, img_width=300
    )
    n_boxes = boxes.shape[1]
    M = min(args.pool, n_boxes)
    k = min(args.nms_k, M if args.selector == "shared" else n_boxes)

    # 4a) box transform alone
    def transform_only(c):
        p, acc = c
        s, b = decode_raw_predictions(p + acc * 1e-20, img_height=300,
                                      img_width=300)
        return (p, acc + (jnp.sum(s) + jnp.sum(b)) * 1e-12)

    record("box_transform", chained_seconds(
        transform_only, (preds, jnp.float32(0)), args.chain * 2))

    # 4b) pool selection (shared selector front end, post-restructure: best
    # positive score -> top-M -> gather y_pred rows -> pooled transform)
    def pool_only(c):
        p, acc = c
        pos = p[..., 1 : C + 1] + acc * 1e-20
        box_best = jnp.max(
            jnp.where(pos > conf_thresh, pos, 0.0), axis=-1
        )
        if args.pool_impl == "approx":
            _, pool_idx = jax.lax.approx_max_k(box_best, M)
            pool_idx = pool_idx.astype(jnp.int32)
        else:
            _, pool_idx = jax.lax.top_k(box_best, M)
        pool_pred = jnp.take_along_axis(p, pool_idx[..., None], axis=1)
        ps, pb = decode_raw_predictions(
            pool_pred, img_height=300, img_width=300
        )
        return (p, acc + (jnp.sum(ps) + jnp.sum(pb)) * 1e-12)

    record("pool_select", chained_seconds(
        pool_only, (preds, jnp.float32(0)), args.chain * 2))

    # fixed pool tensors for the later stages
    pos = scores[..., 1 : C + 1]
    box_best = jnp.max(jnp.where(pos > conf_thresh, pos, 0.0), axis=-1)
    _, pool_idx = jax.lax.top_k(box_best, M)
    pool_scores = jnp.take_along_axis(pos, pool_idx[..., None], axis=1)
    pool_boxes = jnp.take_along_axis(boxes, pool_idx[..., None], axis=1)
    pos_cm = jnp.moveaxis(pool_scores, -1, 1)  # (B, C, M)

    # 4c) per-class top-k over the pool
    def perclass_topk(c):
        p, acc = c
        masked = jnp.where(p > conf_thresh, p, 0.0) + acc * 1e-20
        ts, ti = jax.lax.top_k(masked, k)
        return (p, acc + (jnp.sum(ts) + jnp.sum(ti)) * 1e-12)

    record("per_class_topk", chained_seconds(
        perclass_topk, (pos_cm, jnp.float32(0)), args.chain * 2))

    masked = jnp.where(pos_cm > conf_thresh, pos_cm, 0.0)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = jnp.take_along_axis(
        pool_boxes[:, None, :, :], top_idx[..., None], axis=2
    )

    # 4d) Pallas NMS on the candidates
    from jpeg_detection_resnet_ssd_tpu.ops.pallas_nms import (
        pallas_batched_nms_mask,
    )

    interpret = jax.devices()[0].platform != "tpu"

    def nms_only(c):
        tb, acc = c
        keep = pallas_batched_nms_mask(
            (tb + acc * 1e-20).reshape(B * C, k, 4),
            top_scores.reshape(B * C, k),
            iou_threshold=0.45, border_delta=0.0, interpret=interpret,
            chunk=16 if k % 16 == 0 else 0,
        )
        return (tb, acc + jnp.sum(keep.astype(jnp.float32)) * 1e-9)

    record("pallas_nms", chained_seconds(
        nms_only, (top_boxes, jnp.float32(0)), args.chain * 2))

    # 4e) final global top-k + row assembly
    keep = pallas_batched_nms_mask(
        top_boxes.reshape(B * C, k, 4), top_scores.reshape(B * C, k),
        iou_threshold=0.45, border_delta=0.0, interpret=interpret,
        chunk=16 if k % 16 == 0 else 0,
    ).reshape(B, C, k)

    def final_topk(c):
        ks, acc = c
        kept = jnp.where(keep, ks + acc * 1e-20, 0.0)
        class_ids = jnp.broadcast_to(
            jnp.arange(1, C + 1, dtype=jnp.float32)[None, :, None],
            (B, C, k),
        )
        flat_scores = kept.reshape(B, -1)
        flat_boxes = top_boxes.reshape(B, -1, 4)
        flat_cls = class_ids.reshape(B, -1)
        best, idx = jax.lax.top_k(flat_scores, 200)
        rows = jnp.concatenate(
            [
                jnp.where(best > 0,
                          jnp.take_along_axis(flat_cls, idx, 1), 0.0)[
                    ..., None
                ],
                best[..., None],
                jnp.where(
                    best[..., None] > 0,
                    jnp.take_along_axis(flat_boxes, idx[..., None], 1),
                    0.0,
                ),
            ],
            axis=-1,
        )
        return (ks, acc + jnp.sum(rows[:, :, 1]) * 1e-9)

    record("final_topk_assembly", chained_seconds(
        final_topk, (top_scores, jnp.float32(0)), args.chain * 2))

    decode_ms = results.get("decode_only", 0.0)
    # Post-restructure the shared path transforms only the pooled rows
    # (inside pool_select); the full-tensor box_transform stage is the
    # exact-path cost and would double-count here.
    stages = ("pool_select", "per_class_topk", "pallas_nms",
              "final_topk_assembly")
    if args.selector != "shared":
        stages = ("box_transform",) + stages[1:]
    stage_sum = sum(results.get(s, 0.0) for s in stages)
    print(json.dumps({
        "summary_ms": {n: round(v, 3) for n, v in results.items()},
        "stage_sum_vs_decode_only": [round(stage_sum, 3),
                                     round(decode_ms, 3)],
    }))


if __name__ == "__main__":
    main()

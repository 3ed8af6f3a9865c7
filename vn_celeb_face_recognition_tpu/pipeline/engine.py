"""Fused frame-batch recognition engine: ONE jitted device program for
detect -> align -> embed -> classify over a frame chunk.

This is the TPU-first replacement for the reference's video hot loop
(demo_video.py:86-192), which made a separate host round trip per
stage and per face. Here a [B, H, W, 3] uint8 frame chunk flows
through:

  1. the MTCNN cascade (capacity-bounded, models/mtcnn.py) producing
     padded boxes/landmarks/validity;
  2. batched Umeyama solves + bilinear warp gathers aligning every
     face slot to the canonical 5-point template (ops/similarity,
     ops/image);
  3. fixed standardisation + the embedding encoder (bf16-capable
     MXU convs);
  4. the MLP classifier -> log-probs, argmax, probability.

Padded face slots ride along masked; the host only converts names.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import fixed_image_standardization
from ..ops.similarity import umeyama_similarity
from ..ops.warp_fast import batched_similarity_warp
from ..ops.warp_pallas import batched_similarity_warp_pallas
from ..parallel.mesh import data_sharding, replicated_sharding
from .align import center_point_dict


def _on_tpu():
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


class FusedRecognitionEngine:
    """detect+align+embed+classify for fixed-shape frame chunks.

    Args:
      detector: any detector exposing ``_build_detect_fn(batch, h, w)``
        -> jitted (variables, frames_u8) -> (boxes [B,K,4], scores
        [B,K], points [B,K,5,2], valid [B,K][, sat_counts]) — both
        models.MTCNN (cascade) and models.RetinaFace (single-shot)
        fuse into the program (tests/test_engine.py covers both).
      encoder: (module, variables) embedding net.
      classifier: (module, variables) MLP head.
      target_fs: aligned face size (reference -tg_fs, default 112).
      compute_dtype: jnp.bfloat16 to run encoder matmuls on the MXU in
        bf16 (params stay f32), or jnp.float32.
      mesh: optional jax.sharding.Mesh with a 'data' axis. Weights are
        replicated over the mesh and the frame chunk is sharded over
        'data', so one engine call runs the whole
        detect->align->embed->classify program across every chip with
        XLA-inserted ICI collectives (the multi-chip scale-out of the
        reference's single-GPU video loop, demo_video.py:86-192).
        Chunks whose batch is not divisible by the data axis are padded
        with blank frames and the outputs sliced back.
      face_cap: global align+embed face budget per chunk. The detector
        emits B*out_cap padded slots but typical occupancy is far
        lower; with a cap G < B*out_cap the engine gathers the top-G
        slots by (validity, score) across the WHOLE chunk, runs
        warp+encoder+classifier (+emotion) on those G only, and
        scatters results back — identical outputs whenever the chunk's
        valid-face count fits the budget (every valid slot outranks
        every padded one), and a ``face_cap_overflow`` count (surfaced
        as a warning in :meth:`identify`) when it doesn't. None = no
        compaction.

        An int is a single fixed budget. A list/tuple of ints enables
        BUCKETED compaction: each bucket is its own compiled program
        (the persistent compilation cache amortises this) and
        :meth:`process` speculatively picks the smallest bucket >= the
        last observed valid-face count — videos are temporally
        coherent, so the encoder/emotion stages stop paying FLOPs for
        face-slot padding (~20% of production-chunk arithmetic at the
        old fixed 160-slot cap with 128 valid faces). Overflow is
        counted on device; :meth:`identify` bumps the next chunk's
        bucket when it fires, and :meth:`process_adaptive` re-runs the
        SAME chunk at the bigger bucket so no face is ever dropped.
      face_hint: initial expected valid-face count per chunk (sets the
        first bucket). None = start at the largest bucket (safe).
    """

    def __init__(self, detector, encoder, encoder_variables, classifier,
                 classifier_variables, target_fs=112,
                 compute_dtype=jnp.float32, face_window=224,
                 use_pallas_warp=None, emotion=None,
                 emotion_variables=None, emotion_size=224,
                 emotion_topk=6, mesh=None, face_cap=None,
                 face_hint=None, fused_emotion_stem=None,
                 fused_bottlenecks=None):
        self.detector = detector
        self.encoder = encoder
        self.encoder_variables = encoder_variables
        self.classifier = classifier
        self.classifier_variables = classifier_variables
        self.target_fs = int(target_fs)
        self.template = jnp.asarray(
            center_point_dict[str((self.target_fs, self.target_fs))]
        )
        self.compute_dtype = compute_dtype
        # faces are warped out of a fixed per-face window cut with one
        # contiguous dynamic_slice — bilinear gathers then read a small
        # local buffer instead of striding the whole frame
        self.face_window = int(face_window)
        # the Pallas warp kernel is ~4x the XLA shear formulation on
        # TPU; on CPU it would run interpreted, so default off there
        self.use_pallas_warp = (
            _on_tpu() if use_pallas_warp is None else use_pallas_warp
        )
        # optional fused emotion head (reference recognize_emotion:
        # aligned face -> resize 224 -> ImageNet norm -> 2-branch net
        # -> top-k classes + softmax probs)
        self.emotion = emotion
        self.emotion_variables = emotion_variables
        self.emotion_size = int(emotion_size)
        self.emotion_topk = int(emotion_topk)
        # emotion stem as one Pallas GEMM (ops/emotion_stem_pallas):
        # exact fold of resize(112->224)+conv7x7/s2+BN+ReLU+maxpool.
        # Default OFF — measured and REJECTED on the v5e: production
        # 3,330 -> 3,201 faces/sec (153.4 -> 160.0 ms/chunk). The
        # ~1.3 GB of intermediates it removes (~1.6 ms of HBM) costs
        # less than the formulation's arithmetic inflation (~282
        # extra GFLOP of subposition + lane padding) plus the
        # pack/unpack transposes. Kept opt-in + parity-tested as the
        # conv+pool-fusion pattern's second negative boundary.
        from ..models.resnet_2_branch import ResNet2Branch

        self.fused_emotion_stem = (
            bool(fused_emotion_stem)
            and isinstance(emotion, ResNet2Branch)
            and self.target_fs == 112 and self.emotion_size == 224
        )
        # emotion layer1/layer2 stride-1 tails as VMEM bottleneck-chain
        # Pallas kernels (ops/bottleneck_pallas). Default OFF —
        # measured and REJECTED on the v5e at the production shapes:
        # l1 22.09 / l2 16.66 ms vs XLA's 14.19 / 13.88 (two kernel
        # variants measured; the misaligned-tap relayouts cost more
        # than the ~2.5 GB of intermediates removed — see the module
        # docstring). Kept opt-in + parity-tested as the byte-removal
        # fusion pattern's third negative boundary.
        _bn_gate = (
            isinstance(emotion, ResNet2Branch)
            and self.emotion_size == 224
            and tuple(getattr(emotion, "layers", ())) == (3, 4, 6, 3)
        )
        self.fused_bottlenecks = bool(fused_bottlenecks) and _bn_gate
        self.mesh = mesh
        if face_cap is None:
            self.face_buckets = None
        elif isinstance(face_cap, (list, tuple)):
            self.face_buckets = sorted({int(c) for c in face_cap})
        else:
            self.face_buckets = [int(face_cap)]
        # last observed valid-face count (drives speculative bucket
        # choice); None -> largest bucket until identify() observes one
        self._face_hint = None if face_hint is None else int(face_hint)
        self._jit_cache = {}
        # keep detector weights resident on device (numpy inputs would
        # re-upload per call); under a mesh every weight tree is
        # replicated across the chips once, up front
        if mesh is not None:
            rep = replicated_sharding(mesh)
            self.detector.variables = jax.device_put(
                self.detector.variables, rep
            )
            self.encoder_variables = jax.device_put(
                self.encoder_variables, rep
            )
            self.classifier_variables = jax.device_put(
                self.classifier_variables, rep
            )
            if self.emotion_variables is not None:
                self.emotion_variables = jax.device_put(
                    self.emotion_variables, rep
                )
        else:
            self.detector.variables = jax.device_put(
                self.detector.variables
            )

    @property
    def face_cap(self):
        """Largest configured budget (back-compat summary view)."""
        return self.face_buckets[-1] if self.face_buckets else None

    def _select_cap(self, total_slots):
        """Smallest bucket covering the current hint (or the largest
        bucket when no count has been observed yet), clamped to the
        chunk's total slot count — buckets >= total_slots are no-ops."""
        if not self.face_buckets:
            return None
        buckets = [min(c, total_slots) for c in self.face_buckets]
        hint = self._face_hint
        if hint is not None:
            for c in sorted(set(buckets)):
                if c >= hint:
                    return c if c < total_slots else None
        c = max(buckets)
        return c if c < total_slots else None

    def _build(self, batch, h, w, face_cap):
        # the cascade's jitted fn inlines when traced under this jit,
        # so the whole engine compiles to one device program
        raw_detect = self.detector._build_detect_fn(batch, h, w)
        fs = self.target_fs
        template = self.template
        encoder = self.encoder
        classifier = self.classifier
        kout = self.detector.out_cap
        cdtype = self.compute_dtype

        win = self.face_window
        win = min(win, h, w)
        emotion = self.emotion
        emotion_vars = self.emotion_variables
        emotion_size = self.emotion_size
        emotion_topk = self.emotion_topk

        def run(det_vars, enc_vars, clf_vars, frames_u8):
            det_out = raw_detect(det_vars, frames_u8)
            boxes, score, points, valid = det_out[:4]
            # MTCNN returns per-stage saturation counts as a 5th output
            sat = det_out[4] if len(det_out) > 4 else None
            b, k = boxes.shape[0], boxes.shape[1]
            flat_pts = points.reshape(b * k, 5, 2)
            flat_boxes = boxes.reshape(b * k, 4)
            image_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
            # global face compaction: gather the top-face_cap slots by
            # (validity, score) across the chunk so the align/embed
            # stages only pay for faces that exist
            sel = None
            overflow = None
            if face_cap is not None and face_cap < b * k:
                flat_valid = valid.reshape(b * k)
                selkey = (flat_valid.astype(jnp.float32) * 2.0
                          + score.reshape(b * k))
                _, sel = jax.lax.top_k(selkey, face_cap)
                flat_pts = flat_pts[sel]
                flat_boxes = flat_boxes[sel]
                image_idx = image_idx[sel]
                overflow = jnp.maximum(
                    flat_valid.sum(dtype=jnp.int32) - face_cap, 0
                )
            frames = frames_u8.astype(jnp.float32)

            # cut a fixed window around each face (contiguous slice),
            # shift landmarks into window coords, solve + warp locally
            cx = (flat_boxes[:, 0] + flat_boxes[:, 2]) * 0.5
            cy = (flat_boxes[:, 1] + flat_boxes[:, 3]) * 0.5
            ox = jnp.clip(jnp.round(cx - win / 2), 0, w - win)
            oy = jnp.clip(jnp.round(cy - win / 2), 0, h - win)

            def cut(idx, oyi, oxi):
                return jax.lax.dynamic_slice(
                    frames,
                    (idx, oyi.astype(jnp.int32), oxi.astype(jnp.int32),
                     0),
                    (1, win, win, 3),
                )[0]

            # NOTE: batching 4 slices per loop iteration was measured
            # SLOWER on v5e (10187 vs 10560 faces/sec) — the in-body
            # stack outweighs the saved loop overhead; keep the plain
            # vmapped slice
            windows = jax.vmap(cut)(image_idx, oy, ox)
            local_pts = flat_pts - jnp.stack([ox, oy], axis=-1)[:, None, :]
            mats = jax.vmap(
                lambda lm: umeyama_similarity(lm, template)
            )(local_pts)
            # gather-free shear/matmul warp — the exact gather warp
            # costs ~1000x more on TPU; the Pallas kernel keeps the
            # shear buffers VMEM-resident
            if self.use_pallas_warp:
                faces = batched_similarity_warp_pallas(windows, mats, fs)
            else:
                faces = batched_similarity_warp(windows, mats, fs)
            x = fixed_image_standardization(faces).astype(cdtype)
            emb = encoder.apply(enc_vars, x, train=False)
            emb = emb.astype(jnp.float32)
            logp = classifier.apply(clf_vars, emb, train=False)
            pred = jnp.argmax(logp, axis=-1)
            prob = jnp.exp(
                jnp.take_along_axis(logp, pred[:, None], axis=-1)[:, 0]
            )
            if sel is not None:
                # scatter compacted results back to the padded layout
                # (dropped slots are invalid; identify never reads them)
                pred = jnp.zeros((b * k,), pred.dtype).at[sel].set(pred)
                prob = jnp.zeros((b * k,), prob.dtype).at[sel].set(prob)
                emb = jnp.zeros(
                    (b * k, emb.shape[-1]), emb.dtype
                ).at[sel].set(emb)
            out = {
                "boxes": boxes,
                "scores": score,
                "points": points,
                "valid": valid,
                "pred": pred.reshape(b, k),
                "prob": prob.reshape(b, k),
                "embeddings": emb.reshape(b, k, -1),
            }
            if overflow is not None:
                out["face_cap_overflow"] = overflow
            if sat is not None:
                out["sat_counts"] = sat
            if emotion is not None:
                if self.fused_emotion_stem:
                    from ..ops.emotion_stem_pallas import (
                        emotion_apply_fused,
                    )

                    logits, _ = emotion_apply_fused(
                        emotion, emotion_vars, faces, cdtype)
                else:
                    from ..ops.image import (
                        area_resize,
                        imagenet_normalize,
                    )

                    ex = area_resize(faces,
                                     (emotion_size, emotion_size))
                    ex = imagenet_normalize(ex / 255.0).astype(cdtype)
                    if self.fused_bottlenecks:
                        from ..ops.bottleneck_pallas import (
                            emotion_apply_fused_l12,
                        )

                        logits, _ = emotion_apply_fused_l12(
                            emotion, emotion_vars, ex)
                    else:
                        logits, _ = emotion.apply(emotion_vars, ex,
                                                  train=False)
                logits = logits.astype(jnp.float32)
                eprob = jax.nn.softmax(logits, axis=-1)
                top_p, top_idx = jax.lax.top_k(eprob, emotion_topk)
                if sel is not None:
                    top_idx = jnp.zeros(
                        (b * k, emotion_topk), top_idx.dtype
                    ).at[sel].set(top_idx)
                    top_p = jnp.zeros(
                        (b * k, emotion_topk), top_p.dtype
                    ).at[sel].set(top_p)
                out["emotion_idx"] = top_idx.reshape(b, k, emotion_topk)
                out["emotion_prob"] = top_p.reshape(b, k, emotion_topk)
            return out

        if self.mesh is not None:
            rep = replicated_sharding(self.mesh)
            return jax.jit(
                run,
                in_shardings=(rep, rep, rep, data_sharding(self.mesh, 4)),
            )
        return jax.jit(run)

    def process(self, frames_u8):
        """frames_u8: numpy or device array [B, H, W, 3]. Returns device
        outputs dict (call jax.device_get / .block_until_ready as
        needed). Device-resident inputs skip the host copy."""
        if not isinstance(frames_u8, jax.Array):
            frames_u8 = np.ascontiguousarray(frames_u8)
        b, h, w = frames_u8.shape[:3]
        n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        bp = -(-b // n_data) * n_data
        if bp != b:
            # ragged tail chunk (end of a video): pad with blank frames
            # so every shard stays equal-sized, slice the outputs back
            pad_shape = (bp - b,) + tuple(frames_u8.shape[1:])
            if isinstance(frames_u8, jax.Array):
                frames_u8 = jnp.concatenate(
                    [frames_u8, jnp.zeros(pad_shape, frames_u8.dtype)]
                )
            else:
                frames_u8 = np.concatenate(
                    [frames_u8, np.zeros(pad_shape, frames_u8.dtype)]
                )
        cap = self._select_cap(bp * self.detector.out_cap)
        key = (bp, h, w, cap)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(bp, h, w, cap)
        out = self._jit_cache[key](
            self.detector.variables,
            self.encoder_variables,
            self.classifier_variables,
            frames_u8,
        )
        out = dict(out)
        if bp != b:
            scalar_keys = ("sat_counts", "face_cap_overflow")
            out = {
                k: (v[:b] if k not in scalar_keys else v)
                for k, v in out.items()
            }
        # plain host ints ride along for identify()'s warning paths
        out["_face_cap_used"] = cap
        out["_frame_hw"] = (h, w)
        return out

    def process_adaptive(self, frames_u8, max_retries=None):
        """process() with a device-side overflow check and re-run at
        the next bucket up, so no valid face is ever dropped. Costs one
        scalar fetch per chunk (the callers that use this — the video
        CLIs — fetch the whole output right after anyway)."""
        out = self.process(frames_u8)
        if not self.face_buckets or len(self.face_buckets) < 2:
            return out
        retries = (len(self.face_buckets)
                   if max_retries is None else max_retries)
        for _ in range(retries):
            cap = out.get("_face_cap_used")
            if cap is None or "face_cap_overflow" not in out:
                return out
            overflow = int(np.asarray(out["face_cap_overflow"]))
            if overflow == 0:
                return out
            self._face_hint = cap + overflow
            n_data = (self.mesh.shape["data"]
                      if self.mesh is not None else 1)
            bp = -(-frames_u8.shape[0] // n_data) * n_data
            if self._select_cap(bp * self.detector.out_cap) == cap:
                return out  # already at the top usable bucket
            out = self.process(frames_u8)
        return out

    def identify(self, outputs, name_df, threshold):
        """Host post-pass: padded predictions -> per-frame name lists +
        kept boxes, honouring the per-class threshold dict semantics
        (reference demo_image.py:113-147). When the emotion head is
        fused, each result tuple extends to (names, boxes,
        emotion_topk_idx, emotion_topk_prob) per kept face."""
        outputs = dict(outputs)
        cap_used = outputs.pop("_face_cap_used", None)
        frame_hw = outputs.pop("_frame_hw", None)
        outs = jax.device_get(outputs)
        if "sat_counts" in outs and hasattr(
            self.detector, "warn_capacity_saturation"
        ):
            self.detector.warn_capacity_saturation(
                outs["sat_counts"], hw=frame_hw
            )
        overflow = int(outs.get("face_cap_overflow", 0))
        # speculative bucketing: next chunk's bucket follows this
        # chunk's observed valid count (overflowed counts include the
        # dropped faces so the bump lands above the cap)
        if self.face_buckets:
            # outs["valid"] is the detector's validity (pre-compaction),
            # so its sum already counts any dropped faces
            self._face_hint = int(np.asarray(outs["valid"]).sum())
        if overflow > 0:
            import warnings

            warnings.warn(
                f"engine face_cap={cap_used or self.face_cap} "
                f"overflowed by {overflow} valid faces this chunk — "
                "lowest-score faces were dropped; raise face_cap or "
                "use process_adaptive() for a re-run at the next "
                "bucket.",
                stacklevel=2,
            )
        has_emotion = "emotion_idx" in outs
        results = []
        for i in range(outs["valid"].shape[0]):
            v = outs["valid"][i]
            names, boxes = [], []
            emotion_idx, emotion_prob = [], []
            for j in np.nonzero(v)[0]:
                pred = int(outs["pred"][i][j])
                prob = float(outs["prob"][i][j])
                if isinstance(threshold, dict):
                    thr = threshold[str(pred)]
                else:
                    thr = threshold
                if prob < thr:
                    name = "Unknown"
                else:
                    sel = list(name_df["name"][name_df["label"] == pred])
                    name = sel[0] if sel else "Unknown"
                names.append(name)
                boxes.append(outs["boxes"][i][j])
                if has_emotion:
                    emotion_idx.append(outs["emotion_idx"][i][j])
                    emotion_prob.append(outs["emotion_prob"][i][j])
            if has_emotion:
                results.append((names, boxes, emotion_idx, emotion_prob))
            else:
                results.append((names, boxes))
        return results

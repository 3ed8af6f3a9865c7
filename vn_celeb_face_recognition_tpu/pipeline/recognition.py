"""Inference pipeline library (the reference's L5 layer).

Functional parity with the library half of /root/reference/
demo_image.py — sequential/parallel detect-and-align, recognize_celeb,
identify_person (per-class threshold dict, 'Unknown' fallback),
emotion top-k, drawing — with the device work batched and jitted:

  * ``Encoder`` / ``Classifier`` / ``EmotionModel`` wrap flax modules
    with bucketed-batch jitted applies, so variable face counts across
    a frame batch reuse a handful of compiled programs instead of
    recompiling per count (shape-static XLA rule);
  * the ``parallel_detect_and_align`` path runs the detector once for
    the whole batch and aligns every face with the batched Umeyama +
    warp kernel — one device program per frame chunk;
  * ``sequential_detect_and_align`` reproduces the detect -> crop ->
    per-face landmark -> sanity-check -> warp flow (demo_image.py:
    242-270). The reference used the external FAN 68-point CNN there;
    detector landmarks (MTCNN ONet / RetinaFace head) stand in — the
    reference's own par_fd_vs_aln path already worked this way
    (demo_image.py:273-306).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import transforms_dict
from ..training.checkpoint import load_checkpoint, restore_variables
from .align import alignment


def _bucket(n, minimum=8):
    b = minimum
    while b < n:
        b *= 2
    return b


class _JitApply:
    """Bucketed-batch jitted apply over a flax (module, variables).

    With a mesh, inputs shard over the 'data' axis and variables
    replicate — batched inference (embedding extraction, frame chunks)
    scales across chips with XLA inserting the collectives.
    """

    def __init__(self, module, variables, transform=None, mesh=None):
        self.module = module
        self.variables = variables
        self.transform = transform
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from ..parallel import data_sharding, replicated_sharding

            self._data_sharding = data_sharding(mesh, rank=1)
            self.variables = jax.device_put(
                variables, replicated_sharding(mesh)
            )
        self._cache = {}

    def _fn(self, n):
        if n not in self._cache:
            module = self.module
            transform = self.transform

            @jax.jit
            def run(variables, x):
                if transform is not None:
                    x = transform(x, None)
                return module.apply(variables, x, train=False)

            self._cache[n] = run
        return self._cache[n]

    def __call__(self, x):
        x = np.asarray(x)
        n = x.shape[0]
        b = _bucket(n)
        if self.mesh is not None:
            # keep the sharded batch divisible by the data axis
            lcm = int(self.mesh.shape["data"])
            b = -(-b // lcm) * lcm
        if b != n:
            pad = np.repeat(x[:1], b - n, axis=0)
            x = np.concatenate([x, pad], axis=0)
        if self._data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(
                x, NamedSharding(self.mesh, P("data", *([None] * (
                    x.ndim - 1))))
            )
        out = self._fn(b)(self.variables, jnp.asarray(x))
        if isinstance(out, tuple):
            return tuple(np.asarray(o)[:n] for o in out)
        return np.asarray(out)[:n]

    def eval(self):
        return self


class Encoder(_JitApply):
    """Face embedding model wrapper (InceptionResnetV1 / iresnet...).

    Expects ALREADY-TRANSFORMED float input (the reference applies
    transforms_default before the encoder, demo_image.py:53-64).
    """

    @classmethod
    def build(cls, name, **args):
        from .. import models as model_md

        module, variables = model_md.build_model(name, **args)
        if variables is None:
            size = 160 if name == "InceptionResnetV1" else 112
            variables = module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
            )
        return cls(module, variables)


class Classifier(_JitApply):
    """MLP log-softmax classifier wrapper."""

    @classmethod
    def build(cls, input_dim, num_classes, checkpoint_path=None):
        from ..models import MLPModel

        module = MLPModel(input_dim=input_dim, num_classes=num_classes)
        variables = module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, input_dim)))
        clf = cls(module, variables)
        if checkpoint_path:
            load_model_classify(checkpoint_path, clf)
        return clf


class EmotionModel(_JitApply):
    """2-branch emotion model wrapper; returns (logits, projection)."""

    @classmethod
    def build(cls, name="resnet_2branch_50", **args):
        from .. import models as model_md

        module, variables = model_md.build_model(name, **args)
        if variables is None:
            variables = module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
            )
        return cls(module, variables)


def load_model_classify(checkpoint_path, model):
    """Load a classifier checkpoint (ours, or a torch .pth of the same
    MLP) into a Classifier — reference demo_image.py:16-21."""
    if str(checkpoint_path).endswith((".pth", ".pt")):
        from ..models.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(checkpoint_path)
        model.variables = convert_state_dict(sd)
        print("Loading torch checkpoint: {} ...".format(checkpoint_path))
        return model
    cp = load_checkpoint(checkpoint_path)
    print(
        "Loading checkpoint: {} ... after training for {} epochs.".format(
            checkpoint_path, cp["epoch"]
        )
    )
    model.variables = restore_variables(model.variables, cp["state_dict"])
    return model


# ---------------------------------------------------------------------------
# Core recognition functions (reference demo_image.py:30-171)
# ---------------------------------------------------------------------------


def find_embedding(image_batch, embedding_model):
    """Embed a stacked float face batch."""
    return embedding_model(image_batch)


def find_emotion(image_batch, emotion_model, topk=6):
    """Top-k emotion classes + softmax probabilities
    (demo_image.py:37-47)."""
    logits, _ = emotion_model(image_batch)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    chosen_idx = np.argsort(logits, axis=1)[:, -topk:]
    chosen_prob = np.sort(probs, axis=1)[:, -topk:]
    return np.flip(chosen_idx, axis=1), np.flip(chosen_prob, axis=1)


def identify_person(log_probs, classify_model, name_df, threshold):
    """argmax + exp(prob) + per-class threshold + label->name lookup
    (demo_image.py:113-147). ``log_probs`` may be embeddings (then the
    classifier runs) or already-computed log-probs with
    classify_model=None."""
    if classify_model is not None:
        output = classify_model(log_probs)
    else:
        output = np.asarray(log_probs)
    n_classes = output.shape[1]
    if isinstance(threshold, float):
        threshold_dict = {str(i): threshold for i in range(n_classes)}
    else:
        threshold_dict = threshold

    predictions = np.argmax(output, axis=1)
    probs = np.exp(output)
    chosen_prob = probs[np.arange(len(predictions)), predictions]

    filtered = []
    for idx, prob in enumerate(chosen_prob):
        main_thres = threshold_dict[str(predictions[idx])]
        filtered.append(
            predictions[idx] if prob >= main_thres else n_classes
        )

    list_names = []
    for pred in filtered:
        name = list(name_df["name"][name_df["label"] == pred])
        list_names.append(name[0] if name else "Unknown")
    return list_names


def recognize_celeb(bth_alg_face_list, device, emb_model, classify_model,
                    transforms, label2name_df, threshold):
    """Flatten the per-frame aligned-face lists, transform + embed +
    classify in one batched pass, unflatten names per frame
    (demo_image.py:50-76). ``transforms`` is a batched device transform
    (data.transforms entry) or None for the default fix_std."""
    alg_face_list = []
    for x in bth_alg_face_list:
        alg_face_list += list(x)

    if len(alg_face_list) == 0:
        return [[] for _ in bth_alg_face_list]

    faces = np.stack(
        [np.asarray(f, dtype=np.float32) for f in alg_face_list]
    )
    tf = transforms if transforms is not None else transforms_dict["default"]
    if emb_model.transform is None:
        emb_model.transform = tf
    embeddings = find_embedding(faces, emb_model)
    names = identify_person(embeddings, classify_model, label2name_df,
                            threshold)

    bth_names = []
    counter = 0
    for x in bth_alg_face_list:
        n_face = len(x)
        bth_names.append(names[counter: counter + n_face])
        counter += n_face
    return bth_names


def recognize_emotion(bth_alg_face_list, device, emt_model, transforms,
                      map_label_func, topk=6):
    """Same flatten/unflatten pattern for the emotion head
    (demo_image.py:79-110)."""
    alg_face_list = []
    for x in bth_alg_face_list:
        alg_face_list += list(x)

    if len(alg_face_list) == 0:
        empty = [[] for _ in bth_alg_face_list]
        return empty, [[] for _ in bth_alg_face_list]

    faces = np.stack(
        [np.asarray(f, dtype=np.float32) for f in alg_face_list]
    )
    if emt_model.transform is None:
        emt_model.transform = transforms or transforms_dict["emotion_inf"]
    emotions_cls, probs = find_emotion(faces, emt_model, topk)

    bth_emotions, bth_probs = [], []
    counter = 0
    for x in bth_alg_face_list:
        n_face = len(x)
        if n_face > 0:
            emotions = map_label_func(emotions_cls[counter:counter + n_face])
        else:
            emotions = []
        bth_emotions.append(emotions)
        bth_probs.append(probs[counter: counter + n_face])
        counter += n_face
    return bth_emotions, bth_probs


# ---------------------------------------------------------------------------
# Drawing (cv2 host-side, demo_image.py:150-171)
# ---------------------------------------------------------------------------


def draw_boxes_on_image(image, boxes, list_names):
    import cv2

    np_image = np.array(image)
    for box, name in zip(boxes, list_names):
        p1 = (int(box[0]), int(box[1]))
        p2 = (int(box[2]), int(box[3]))
        cv2.rectangle(np_image, p1, p2, (0, 255, 0), 2)
        cv2.putText(np_image, name, (int(box[2]), int(box[1])),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.75, (0, 255, 0), 2,
                    cv2.LINE_AA)
    return np_image


def draw_emotions(image, bboxes, emotion_tags, emotion_percent):
    import cv2

    for idx, box in enumerate(bboxes):
        for i, (emotion, percent) in enumerate(
            zip(emotion_tags[idx], emotion_percent[idx])
        ):
            cv2.putText(
                image,
                "{} - {:.2f}%".format(emotion, percent * 100),
                (int(box[0] + 5), int(box[1]) + (i + 1) * 16),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
                cv2.LINE_AA,
            )
    return image


# ---------------------------------------------------------------------------
# Detect + align front-ends (demo_image.py:174-306)
# ---------------------------------------------------------------------------


def get_face_from_boxes(image, boxes, box_requirements=None):
    """Crop faces with the min-dim / aspect-ratio gate
    (demo_image.py:174-199)."""
    list_faces, face_idx = [], []
    ori_h, ori_w = image.shape[:2]
    for idx, box in enumerate(boxes):
        x1 = max(int(box[0]), 0)
        y1 = max(int(box[1]), 0)
        x2 = min(int(box[2] + 1), ori_w)
        y2 = min(int(box[3] + 1), ori_h)
        w, h = x2 - x1, y2 - y1
        if w <= 0 or h <= 0:
            continue
        max_dim, min_dim = max(w, h), min(w, h)
        chosen = box_requirements is None or (
            min_dim > box_requirements["min_dim"]
            and max_dim / min_dim < box_requirements["box_ratio"]
        )
        if chosen:
            list_faces.append(image[y1:y2, x1:x2, :])
            face_idx.append(idx)
    return list_faces, face_idx


def move_landmark_to_box(box, landmark):
    """Shift frame-coord landmarks into the crop's frame
    (demo_image.py:236-239)."""
    return np.asarray(landmark) - np.asarray(box[:2])


def landmarks_geometrically_sane(pts):
    """Eye/nose/mouth vertical-ordering sanity check
    (demo_image.py:223-228): eyes above nose, nose above mouth."""
    p1, p2, p3, p4, p5 = pts
    return (
        np.mean([p1[1], p2[1]]) < p3[1]
        and p3[1] < np.mean([p4[1], p5[1]])
        and min(p4[1], p5[1]) > max(p1[1], p2[1])
        and min(p1[1], p2[1]) < p3[1]
        and p3[1] < max(p4[1], p5[1])
    )


def sequential_detect_and_align(rgb_images, detection_md, center_point,
                                target_fs, box_requirements=None,
                                log=False, fa_model=None):
    """Detect boxes+landmarks, gate boxes, sanity-check landmarks, warp
    (demo_image.py:242-270). Landmark source: ``fa_model`` (a
    models.fan.FANLandmarker, the reference's per-face 68-point CNN
    flow, demo_image.py:201-234 with the 68->5 reduction) when given,
    else the detector's own 5-point landmarks (the reference's
    par_fd_vs_aln behaviour). Returns (per-image aligned-face lists,
    per-image chosen boxes)."""
    if isinstance(rgb_images, np.ndarray) and rgb_images.ndim == 3:
        rgb_images = [rgb_images]
    bth_boxes, _, bth_landmarks = detection_md.inference(
        rgb_images, landmark=True
    )
    bth_aligned, bth_chosen = [], []
    for idx, (boxes, landmarks) in enumerate(zip(bth_boxes, bth_landmarks)):
        aligned_face_list, chosen_boxes = [], []
        rgb_image = np.asarray(rgb_images[idx])
        if len(boxes) > 0:
            list_face, face_idx = get_face_from_boxes(
                rgb_image, boxes, box_requirements
            )
            for j, face in enumerate(list_face):
                if fa_model is not None:
                    from ..models.fan import reduce_to_5_points

                    pts68 = fa_model.get_landmarks(face)[0]
                    lm, sane = reduce_to_5_points(pts68)
                else:
                    lm = move_landmark_to_box(
                        boxes[face_idx[j]], landmarks[face_idx[j]]
                    )
                    sane = landmarks_geometrically_sane(lm)
                if not sane:
                    if log:
                        print("Landmarks failed the sanity check !")
                    continue
                aligned = alignment(face, center_point, lm, target_fs[0],
                                    target_fs[1])
                aligned_face_list.append(aligned)
                chosen_boxes.append(boxes[face_idx[j]])
            if log and not aligned_face_list:
                print(
                    "Bounding boxes were not qualified or could not "
                    "detect landmarks !"
                )
        elif log:
            print("Face not found in this image !")
        bth_aligned.append(aligned_face_list)
        bth_chosen.append(chosen_boxes)
    return bth_aligned, bth_chosen


def parallel_detect_and_align(rgb_images, detection_md, center_point,
                              target_fs, log=False):
    """One batched detector pass with its own landmarks, then warp
    (demo_image.py:273-306)."""
    if isinstance(rgb_images, np.ndarray) and rgb_images.ndim == 3:
        rgb_images = [rgb_images]
    bth_boxes, _, bth_landmarks = detection_md.inference(
        rgb_images, landmark=True
    )
    bth_aligned, bth_chosen = [], []
    for idx, (boxes, landmarks) in enumerate(zip(bth_boxes, bth_landmarks)):
        aligned_face_list, chosen_boxes = [], []
        rgb_image = np.asarray(rgb_images[idx])
        if len(boxes) > 0:
            list_face, face_idx = get_face_from_boxes(rgb_image, boxes)
            if len(face_idx) > 0:
                chosen_boxes = [boxes[x] for x in face_idx]
                chosen_lms = [landmarks[x] for x in face_idx]
                for j, face in enumerate(list_face):
                    moved = move_landmark_to_box(chosen_boxes[j],
                                                 chosen_lms[j])
                    aligned = alignment(face, center_point, moved,
                                        target_fs[0], target_fs[1])
                    aligned_face_list.append(aligned)
            elif log:
                print(
                    "Bounding boxes were not qualified or could not "
                    "detect landmarks !"
                )
        elif log:
            print("Face not found in this image !")
        bth_aligned.append(aligned_face_list)
        bth_chosen.append(chosen_boxes)
    return bth_aligned, bth_chosen

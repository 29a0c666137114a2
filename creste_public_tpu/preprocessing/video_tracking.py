"""Video instance tracking for dynamic SAM labels (pluggable FM backends).

Parity target: the reference's dynamic labeling pipeline —
scripts/preprocessing/create_sam_dataset.py:312-448 (GroundingDINO box
prompts -> SAM2 image masks -> SAM2 video propagation) and the IoU-tracked
instance registry of scripts/preprocessing/sam2_utils/
mask_dictionary_model.py (MaskDictionaryModel.update_masks, iou 0.8).

Design: the three foundation-model roles are interfaces —

  Detector       : image -> (boxes [N,4], class_ids [N])      (GroundingDINO)
  MaskPredictor  : image, boxes -> masks [N, H, W] bool       (SAM2 image)
  VideoPropagator: frames, masks -> per-frame propagated masks (SAM2 video)

Real HF-backed implementations load lazily and only when weights are
available (zero-egress environments fall back); the deterministic fakes
(threshold blobs + centroid-matched propagation) exercise the *algorithm* —
registry reconciliation, id persistence, per-frame map emission — without
any model weights, so the tracking logic is testable everywhere.

Per-frame output: [H, W, 2] uint16 (instance_id, class_id), the contract
build_sam_map's dynamic mode consumes; class ids follow
coda_constants.SAM_DYNAMIC_LABEL_MAP (reference coda_utils.py:6-31).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Protocol

import numpy as np

from creste_public_tpu.data.coda_constants import (
    SAM_DYNAMIC_CLASSES,
    SAM_DYNAMIC_LABEL_MAP,
    SAM_DYNAMIC_TEXT_PROMPTS,
)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """MaskDictionaryModel.calculate_iou (mask_dictionary_model.py:74-86)."""
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    inter = float((a * b).sum())
    union = float(a.sum() + b.sum() - inter)
    return inter / union if union > 0 else 0.0


@dataclass
class ObjectInfo:
    """mask_dictionary_model.py ObjectInfo."""

    instance_id: int = 0
    mask: np.ndarray | None = None
    class_id: int = 0


@dataclass
class InstanceRegistry:
    """MaskDictionaryModel: per-frame object registry with IoU-based id
    reconciliation against the previous frame's tracked registry."""

    labels: dict[int, ObjectInfo] = field(default_factory=dict)

    def add_detections(
        self, masks: np.ndarray, class_ids: np.ndarray
    ) -> None:
        """Fresh per-frame detections, provisional ids 1..N
        (add_new_frame_annotation)."""
        self.labels = {
            i + 1: ObjectInfo(i + 1, m.astype(bool), int(c))
            for i, (m, c) in enumerate(zip(masks, class_ids))
        }

    def reconcile(
        self,
        tracked: "InstanceRegistry",
        objects_count: int,
        iou_threshold: float = 0.8,
    ) -> int:
        """update_masks (mask_dictionary_model.py:38-66): each new detection
        adopts the tracked instance id it overlaps with IoU > threshold,
        otherwise receives a fresh global id. Returns the updated count."""
        updated: dict[int, ObjectInfo] = {}
        for obj in self.labels.values():
            if obj.mask is None or obj.mask.sum() == 0:
                continue
            matched = 0
            for prev in tracked.labels.values():
                if prev.mask is not None and mask_iou(obj.mask, prev.mask) > iou_threshold:
                    matched = prev.instance_id
                    break
            if not matched:
                objects_count += 1
                matched = objects_count
            updated[matched] = ObjectInfo(matched, obj.mask, obj.class_id)
        self.labels = updated
        return objects_count

    def to_maps(self, hw: tuple[int, int]) -> np.ndarray:
        """[H, W, 2] uint16 (instance, class); later ids overwrite."""
        out = np.zeros((*hw, 2), np.uint16)
        for obj in sorted(self.labels.values(), key=lambda o: o.instance_id):
            if obj.mask is not None:
                out[obj.mask, 0] = obj.instance_id
                out[obj.mask, 1] = obj.class_id
        return out


# ---------------------------------------------------------------------------
# interfaces
# ---------------------------------------------------------------------------


class Detector(Protocol):
    def detect(self, image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """image [H,W,3] -> (boxes [N,4] xyxy, class_ids [N])."""


class MaskPredictor(Protocol):
    def predict(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """image, boxes [N,4] -> masks [N, H, W] bool."""


class VideoPropagator(Protocol):
    def propagate(
        self, frames: list[np.ndarray], registry: InstanceRegistry,
        start: int, count: int,
    ) -> dict[int, InstanceRegistry]:
        """Track registry masks through frames[start:start+count]."""


# ---------------------------------------------------------------------------
# real FM backends (lazy; None when weights unavailable)
# ---------------------------------------------------------------------------


def grounding_dino_prompt() -> str:
    """'pedestrian. vehicle. ...' prompt string (create_sam_dataset.py:352)."""
    return " ".join(f"{name}." for name in SAM_DYNAMIC_CLASSES[1:])


class GroundingDinoDetector:
    """HF IDEA-Research/grounding-dino-base zero-shot box detector
    (create_sam_dataset.py:347-386)."""

    def __init__(self, model_id="IDEA-Research/grounding-dino-base",
                 box_threshold=0.25, text_threshold=0.25):
        from transformers import (AutoModelForZeroShotObjectDetection,
                                  AutoProcessor)

        self.processor = AutoProcessor.from_pretrained(model_id)
        self.model = AutoModelForZeroShotObjectDetection.from_pretrained(
            model_id)
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self._synonyms = {
            syn: name for name, syns in SAM_DYNAMIC_TEXT_PROMPTS.items()
            for syn in syns
        }

    def detect(self, image):
        import torch as _t
        from PIL import Image

        pil = Image.fromarray(image)
        inputs = self.processor(images=pil, text=grounding_dino_prompt(),
                                return_tensors="pt")
        with _t.no_grad():
            outputs = self.model(**inputs)
        # transformers renamed box_threshold -> threshold (>=4.51); this
        # call path only executes with real weights, so it is pinned by
        # the tiny-artifact engagement test (tests/test_real_backends.py)
        results = self.processor.post_process_grounded_object_detection(
            outputs, inputs.input_ids, threshold=self.box_threshold,
            text_threshold=self.text_threshold,
            target_sizes=[pil.size[::-1]])
        boxes = results[0]["boxes"].cpu().numpy()
        labels = results[0].get("text_labels", results[0]["labels"])
        cls = np.array([
            SAM_DYNAMIC_LABEL_MAP.get(
                self._synonyms.get(lbl, lbl), 0)
            for lbl in labels
        ], dtype=np.int64)
        return boxes.reshape(-1, 4), cls


def try_load_detector(model_id: str | None = None) -> Detector | None:
    """Real GroundingDINO when weights resolve (hub cache or a local HF
    checkpoint dir via ``CRESTE_GROUNDING_DINO``), else None — callers
    fall back to the deterministic fakes."""
    model_id = model_id or os.environ.get(
        "CRESTE_GROUNDING_DINO", "IDEA-Research/grounding-dino-base")
    try:
        return GroundingDinoDetector(model_id=model_id)
    except Exception:
        return None


class HFSamMaskPredictor:
    """facebook/sam-vit-* box-prompted mask predictor (the SAM2 image
    predictor role, create_sam_dataset.py:336-349)."""

    def __init__(self, model_id="facebook/sam-vit-huge"):
        from transformers import SamModel, SamProcessor

        self.processor = SamProcessor.from_pretrained(model_id)
        self.model = SamModel.from_pretrained(model_id)

    def predict(self, image, boxes):
        import torch as _t
        from PIL import Image

        pil = Image.fromarray(image)
        inputs = self.processor(
            pil, input_boxes=[[list(map(float, b)) for b in boxes]],
            return_tensors="pt")
        with _t.no_grad():
            outputs = self.model(**inputs, multimask_output=False)
        masks = self.processor.image_processor.post_process_masks(
            outputs.pred_masks.cpu(), inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu())[0]
        return masks[:, 0].numpy().astype(bool)


class HFSamAutoMaskGenerator:
    """Torchvision-free automatic mask generation over SamModel: an
    n x n point grid prompted through the model, IoU-score filtered and
    greedily deduplicated with ``mask_iou``. Replaces the HF
    "mask-generation" pipeline (whose postprocess requires torchvision's
    batched_nms, absent in this image) for the static SAM label path
    (reference create_sam_dataset.py:195,451-497
    SAM2AutomaticMaskGenerator)."""

    def __init__(self, model_id="facebook/sam-vit-huge",
                 points_per_side: int = 8, pred_iou_thresh: float = 0.5,
                 dedup_iou: float = 0.7, points_per_batch: int = 64):
        from transformers import SamModel, SamProcessor

        self.processor = SamProcessor.from_pretrained(model_id)
        self.model = SamModel.from_pretrained(model_id).eval()
        self.n = points_per_side
        self.pred_iou_thresh = pred_iou_thresh
        self.dedup_iou = dedup_iou
        self.points_per_batch = points_per_batch

    def generate(self, image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """image [H, W, 3] uint8 -> (masks [N, H, W] bool, scores [N])."""
        import torch as _t
        from PIL import Image

        H, W = image.shape[:2]
        ys = (np.arange(self.n) + 0.5) * H / self.n
        xs = (np.arange(self.n) + 0.5) * W / self.n
        pts = [[[float(x), float(y)]] for y in ys for x in xs]
        pil = Image.fromarray(image)
        all_masks, all_scores = [], []
        for i in range(0, len(pts), self.points_per_batch):
            chunk = pts[i:i + self.points_per_batch]
            inputs = self.processor(pil, input_points=[chunk],
                                    return_tensors="pt")
            with _t.no_grad():
                out = self.model(**inputs, multimask_output=True)
            masks = self.processor.image_processor.post_process_masks(
                out.pred_masks.cpu(), inputs["original_sizes"].cpu(),
                inputs["reshaped_input_sizes"].cpu())[0]  # [P, 3, H, W]
            scores = out.iou_scores.cpu()[0]  # [P, 3]
            best = scores.argmax(-1)
            idx = _t.arange(masks.shape[0])
            all_masks.append(masks[idx, best].numpy().astype(bool))
            all_scores.append(scores[idx, best].numpy())
        masks = np.concatenate(all_masks, 0)
        scores = np.concatenate(all_scores, 0)
        keep_q = scores >= self.pred_iou_thresh
        masks, scores = masks[keep_q], scores[keep_q]
        # greedy dedup, best score first (the batched_nms role)
        order = np.argsort(-scores)
        kept: list[int] = []
        for j in order:
            if not masks[j].any():
                continue
            if all(mask_iou(masks[j], masks[k]) < self.dedup_iou
                   for k in kept):
                kept.append(int(j))
        return masks[kept], scores[kept]


def try_load_auto_mask_generator(
        model_id: str | None = None, **kwargs
) -> HFSamAutoMaskGenerator | None:
    """Real SAM automatic mask generation when weights resolve (hub cache
    or ``CRESTE_SAM_MODEL``), else None."""
    model_id = model_id or os.environ.get(
        "CRESTE_SAM_MODEL", "facebook/sam-vit-huge")
    try:
        return HFSamAutoMaskGenerator(model_id=model_id, **kwargs)
    except Exception:
        return None


def try_load_mask_predictor(model_id: str | None = None) -> MaskPredictor | None:
    """Real SAM when weights resolve (hub cache or a local HF checkpoint
    dir via ``CRESTE_SAM_MODEL``), else None."""
    model_id = model_id or os.environ.get(
        "CRESTE_SAM_MODEL", "facebook/sam-vit-huge")
    try:
        return HFSamMaskPredictor(model_id=model_id)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# deterministic fakes (testing + weightless environments)
# ---------------------------------------------------------------------------


class FakeBlobDetector:
    """Connected bright blobs above ``threshold`` become detections; class
    cycles through the movable classes deterministically by blob order."""

    def __init__(self, threshold: float = 200.0, min_area: int = 4):
        self.threshold = threshold
        self.min_area = min_area

    def detect(self, image):
        from scipy import ndimage

        gray = image.mean(axis=-1) if image.ndim == 3 else image
        lab, n = ndimage.label(gray > self.threshold)
        boxes, cls = [], []
        for i in range(1, n + 1):
            ys, xs = np.nonzero(lab == i)
            if len(ys) < self.min_area:
                continue
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            cls.append(1 + (len(cls) % (len(SAM_DYNAMIC_CLASSES) - 1)))
        return (np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(cls, np.int64))


class FakeBoxMaskPredictor:
    """Masks = thresholded pixels inside each box (deterministic)."""

    def __init__(self, threshold: float = 200.0):
        self.threshold = threshold

    def predict(self, image, boxes):
        gray = image.mean(axis=-1) if image.ndim == 3 else image
        hot = gray > self.threshold
        masks = np.zeros((len(boxes), *gray.shape), bool)
        for i, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
            masks[i, y0:y1, x0:x1] = hot[y0:y1, x0:x1]
        return masks


def _shift_mask(mask: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Translate a bool mask with zero fill (no wraparound)."""
    H, W = mask.shape
    out = np.zeros_like(mask)
    ys0, ys1 = max(dy, 0), min(H + dy, H)
    xs0, xs1 = max(dx, 0), min(W + dx, W)
    if ys0 >= ys1 or xs0 >= xs1:
        return out
    out[ys0:ys1, xs0:xs1] = mask[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx]
    return out


@dataclass
class _Track:
    """Per-instance tracker state for TemplateMaskPropagator."""

    template: np.ndarray  # full-frame bool mask at last known position
    velocity: tuple[float, float]  # (dy, dx) px/frame
    class_id: int
    coast: int = 0  # consecutive occluded frames


class TemplateMaskPropagator:
    """Weights-free MASK-shaped video propagation — the SAM2 video-predictor
    role (create_sam_dataset.py:312-448 + sam2_utils/) without foundation
    models. Replaces round-2's centroid-matching fake (VERDICT r2 #4).

    Per frame, per tracked instance:
      1. predict: the template translates by the instance's velocity;
      2. localize: best integer shift within ``search`` px of the prediction
         maximizing foreground overlap (one FFT cross-correlation);
      3. extract: the new mask is foreground within a ``dilate``-px band of
         the localized template — mask-shaped, so it follows deformation
         instead of translating a frozen blob;
      4. compete: pixels claimed by several instances go to the instance
         whose localized template is nearest (distance transform), which
         keeps crossing tracks separate while their masks touch or merge;
      5. coast: a match covering < ``match_min`` of the template area marks
         the instance occluded; it advances on its velocity (emitting no
         mask) for up to ``max_coast`` frames and re-acquires when the
         match recovers.

    ``threshold`` defines the foreground ("objectness") signal, consistent
    with the fake detector/segmenter pair; a real SAM2 backend slots into
    the same VideoPropagator interface when weights are available.
    """

    def __init__(self, threshold: float = 200.0, search: int = 8,
                 dilate: int = 2, match_min: float = 0.3,
                 max_coast: int = 5, velocity_ema: float = 0.5):
        self.threshold = threshold
        self.search = search
        self.dilate = dilate
        self.match_min = match_min
        self.max_coast = max_coast
        self.velocity_ema = velocity_ema

    def _localize(self, fg: np.ndarray, tr: _Track) -> tuple[np.ndarray, float]:
        """Best-shift template placement against the foreground.

        Returns (localized template, coverage in [0, 1])."""
        from scipy.signal import fftconvolve

        H, W = fg.shape
        area = float(tr.template.sum())
        if area == 0:
            return tr.template, 0.0
        # corr[H-1+dy, W-1+dx] = |fg & shift(template, dy, dx)|
        corr = fftconvolve(
            fg.astype(np.float32),
            tr.template[::-1, ::-1].astype(np.float32),
            mode="full",
        )
        pdy, pdx = int(round(tr.velocity[0])), int(round(tr.velocity[1]))
        s = self.search
        ys = slice(max(H - 1 + pdy - s, 0), min(H + pdy + s, corr.shape[0]))
        xs = slice(max(W - 1 + pdx - s, 0), min(W + pdx + s, corr.shape[1]))
        win = corr[ys, xs]
        if win.size == 0:
            return _shift_mask(tr.template, pdy, pdx), 0.0
        # motion-prior tie-break: inside a merged blob every placement of a
        # small template scores identically — among near-maximal shifts take
        # the one closest to the velocity prediction.
        best = float(win.max())
        cand_iy, cand_ix = np.nonzero(win >= 0.98 * best)
        dy_all = cand_iy + ys.start - (H - 1)
        dx_all = cand_ix + xs.start - (W - 1)
        k = int(np.argmin((dy_all - pdy) ** 2 + (dx_all - pdx) ** 2))
        dy, dx = int(dy_all[k]), int(dx_all[k])
        placed = _shift_mask(tr.template, dy, dx)
        return placed, float(win[cand_iy[k], cand_ix[k]]) / area

    def propagate(self, frames, registry, start, count):
        from scipy import ndimage

        tracks: dict[int, _Track] = {
            oid: _Track(o.mask.astype(bool), (0.0, 0.0), o.class_id)
            for oid, o in registry.labels.items()
            if o.mask is not None and o.mask.sum() > 0
        }
        out: dict[int, InstanceRegistry] = {}
        struct = ndimage.generate_binary_structure(2, 2)
        for f in range(start, min(start + count, len(frames))):
            img = frames[f]
            gray = img.mean(axis=-1) if img.ndim == 3 else img
            fg = gray > self.threshold

            placements: dict[int, tuple[np.ndarray, float]] = {}
            for oid, tr in tracks.items():
                placements[oid] = self._localize(fg, tr)

            # candidate support per instance: foreground near its template
            cands: dict[int, np.ndarray] = {}
            dists: dict[int, np.ndarray] = {}
            for oid, (placed, cover) in placements.items():
                if cover < self.match_min:
                    continue
                band = ndimage.binary_dilation(
                    placed, structure=struct, iterations=self.dilate
                )
                cands[oid] = fg & band
                dists[oid] = ndimage.distance_transform_edt(~placed)

            # per-pixel competition between overlapping candidates
            if cands:
                oids = list(cands)
                stack = np.stack([
                    np.where(cands[o], dists[o], np.inf) for o in oids
                ])
                winner = np.argmin(stack, axis=0)
                any_claim = np.isfinite(stack.min(axis=0))
                masks = {
                    o: any_claim & (winner == i) for i, o in enumerate(oids)
                }
            else:
                masks = {}

            reg = InstanceRegistry()
            dead = []
            for oid, tr in tracks.items():
                new_mask = masks.get(oid)
                matched = (
                    new_mask is not None
                    and new_mask.sum() >= self.match_min * tr.template.sum()
                )
                if matched:
                    oy, ox = ndimage.center_of_mass(tr.template)
                    ny, nx = ndimage.center_of_mass(new_mask)
                    a = self.velocity_ema
                    tr.velocity = (
                        a * tr.velocity[0] + (1 - a) * (ny - oy),
                        a * tr.velocity[1] + (1 - a) * (nx - ox),
                    )
                    tr.template = new_mask
                    tr.coast = 0
                    reg.labels[oid] = ObjectInfo(oid, new_mask, tr.class_id)
                else:
                    # occluded: coast along the velocity, emit nothing
                    tr.coast += 1
                    if tr.coast > self.max_coast:
                        dead.append(oid)
                        continue
                    tr.template = _shift_mask(
                        tr.template,
                        int(round(tr.velocity[0])),
                        int(round(tr.velocity[1])),
                    )
            for oid in dead:
                del tracks[oid]
            out[f] = reg
        return out


# ---------------------------------------------------------------------------
# the tracking loop (create_sam_dataset.py:312-448)
# ---------------------------------------------------------------------------


def track_video(
    frames: list[np.ndarray],
    detector: Detector,
    mask_predictor: MaskPredictor,
    propagator: VideoPropagator,
    step: int = 1,
    iou_threshold: float = 0.8,
) -> list[np.ndarray]:
    """Detect every ``step`` frames, reconcile ids against the tracked
    registry (IoU 0.8), propagate through the gap — the reference's Steps
    2-5. Returns per-frame [H, W, 2] uint16 (instance, class) maps.
    """
    hw = frames[0].shape[:2]
    results = [np.zeros((*hw, 2), np.uint16) for _ in frames]
    tracked = InstanceRegistry()
    objects_count = 0
    for start in range(0, len(frames), step):
        boxes, cls = detector.detect(frames[start])
        if len(boxes):
            masks = mask_predictor.predict(frames[start], boxes)
            det = InstanceRegistry()
            det.add_detections(masks, cls)
            objects_count = det.reconcile(tracked, objects_count,
                                          iou_threshold)
        else:
            det = tracked  # nothing detected: keep tracking what we have
        if not det.labels:
            continue
        # The keyframe's map comes straight from the reconciled detection
        # masks (the real detector/segmenter output — a propagator must not
        # re-derive them); the propagator only bridges the gap frames, up
        # to and INCLUDING the next keyframe (the reference's
        # propagate_in_video(max_frame_num_to_track=step) ends on the next
        # detection frame) so reconciliation compares same-frame masks.
        # The next window's detection overwrites the shared keyframe map.
        results[start] = det.to_maps(hw)
        tracked = det
        segments = propagator.propagate(frames, det, start + 1, step)
        for fidx, reg in sorted(segments.items()):
            results[fidx] = reg.to_maps(hw)
            tracked = reg
    return results

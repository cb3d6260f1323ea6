"""Attention heatmaps over slide thumbnails (reference ``scripts/create_heatmaps.py``).

Pipeline parity (``create_heatmaps.py:90-179``): load CLAM_SB from a
checkpoint with encoder-prefix surgery and a **fresh** classifier head
(``:42-59``), run attention over the FULL unsampled bag (``:160-162``),
min-max normalize to [0,255], JET colormap, paint each patch rectangle at
thumbnail scale, 50/50 ``addWeighted`` blend, optional ground-truth ROI
contours from Camelyon16 annotation XML (``:75-87``).

TPU notes: full bags are variable-length; bags are padded to the next
``bucket`` multiple with a mask so XLA compiles once per bucket instead of
once per slide. The pixel-painting path is pure numpy/cv2, unchanged
semantics.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional
from xml.dom import minidom

import cv2
import numpy as np

from murcl_tpu.preprocess.slide_io import get_three_points, open_slide
from murcl_tpu.utils.general import load_json


def load_annotations_xml(annotations_xml) -> List[np.ndarray]:
    """Camelyon16 ROI polygons -> list of (N, 1, 2) float contours."""
    dom = minidom.parse(str(annotations_xml))
    contours = []
    for a in dom.documentElement.getElementsByTagName("Annotation"):
        coords = a.getElementsByTagName("Coordinates")[0].getElementsByTagName("Coordinate")
        contour = np.array(
            [[c.getAttribute("X"), c.getAttribute("Y")] for c in coords], dtype=np.float64
        )
        contours.append(contour[:, None, :])
    return contours


def create_heatmap(coord_filepath, attention, slide_level: int = -1,
                   contours: Optional[list] = None) -> np.ndarray:
    """Paint per-patch attention onto the slide thumbnail; returns BGR image."""
    coord_dict = load_json(coord_filepath)
    coords = coord_dict["coords"]
    num_patches = coord_dict["num_patches"]
    patch_size_level0 = coord_dict["patch_size_level0"]
    slide = open_slide(coord_dict["slide_filepath"])
    thumbnail = slide.get_thumbnail(slide.level_dimensions[slide_level]).convert("RGB")
    thumbnail = cv2.cvtColor(np.asarray(thumbnail), cv2.COLOR_RGB2BGR)
    level_downsample = slide.level_downsamples[slide_level]
    assert num_patches == len(coords) == len(attention), \
        f"{num_patches}-{len(coords)}-{len(attention)}"

    attention = np.asarray(attention, dtype=np.float64)
    rng = np.max(attention) - np.min(attention)
    attention = np.uint8(255 * (attention - np.min(attention)) / (rng if rng else 1.0))
    # column vector -> (N, 1, 3) regardless of cv2 version
    colors = cv2.applyColorMap(attention.reshape(-1, 1), cv2.COLORMAP_JET)

    heatmap = np.full(thumbnail.shape, 255, dtype=np.uint8)
    for i, c in enumerate(coords):
        tl, br, _ = get_three_points(c["col"], c["row"], patch_size_level0 / level_downsample)
        color = (int(colors[i, 0, 0]), int(colors[i, 0, 1]), int(colors[i, 0, 2]))
        cv2.rectangle(heatmap, tl, br, color=color, thickness=-1)
    heatmap = cv2.addWeighted(heatmap, 0.5, thumbnail, 0.5, 0)

    if contours is not None:
        contours = [np.asarray(c / level_downsample).astype(np.int32) for c in contours]
        heatmap = cv2.drawContours(heatmap, contours, -1, (0, 255, 255), thickness=5)
    return heatmap


class AttentionScorer:
    """CLAM_SB attention over full bags, bucket-padded for static shapes."""

    def __init__(self, dim_patch: int, num_classes: int, size_arg: str = "small",
                 k_sample: int = 8, checkpoint: Optional[str] = None,
                 bucket: int = 512):
        import jax
        import jax.numpy as jnp

        from murcl_tpu.engine.checkpoint import load_checkpoint, transfer_params
        from murcl_tpu.models import CLAM_SB

        self.bucket = bucket
        # exact gate math: heatmap attention feeds a min-max-normalized
        # uint8 colormap parity claim (create_heatmaps.py:112-114); keep
        # the visualisation path free of the training-only approximation
        self.model = CLAM_SB(in_dim=dim_patch, gate=True, size_arg=size_arg,
                             dropout=0.25, k_sample=k_sample,
                             n_classes=num_classes, subtyping=True,
                             attn_gate_math="exact")
        params = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, bucket, dim_patch))
        )
        if checkpoint is not None:
            ckpt = load_checkpoint(checkpoint)
            loaded = transfer_params(params, ckpt["model_state_dict"])
            # fresh classifier head (create_heatmaps.py:58-59): keep the
            # aggregator weights, restore the fresh init of `classifiers`
            loaded["params"]["classifiers"] = params["params"]["classifiers"]
            params = loaded
        self.params = params

        @jax.jit
        def attend(params, bag, mask):
            _, aux = self.model.apply(params, bag, mask=mask)
            return aux["attention"]

        self._attend = attend

    def __call__(self, feats: np.ndarray) -> np.ndarray:
        """(N, D) full bag -> (N,) raw attention scores."""
        import jax.numpy as jnp

        n = feats.shape[0]
        padded = -(-n // self.bucket) * self.bucket
        bag = np.zeros((1, padded, feats.shape[1]), dtype=np.float32)
        bag[0, :n] = feats
        mask = np.zeros((1, padded), dtype=bool)
        mask[0, :n] = True
        att = np.asarray(self._attend(self.params, jnp.asarray(bag), jnp.asarray(mask)))
        return att[0, :n]


def run_heatmaps(args) -> None:
    """Batch CLI body (``create_heatmaps.py:135-179``)."""
    from murcl_tpu.data.datasets import WSIDataset

    dataset = WSIDataset(data_csv=args.data_csv, shuffle=False, preload=args.preload)
    scorer = AttentionScorer(
        dim_patch=dataset.patch_dim, num_classes=args.num_classes,
        size_arg=args.size_arg, k_sample=args.k_sample,
        checkpoint=args.checkpoint, bucket=args.bucket,
    )
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    for i in range(len(dataset)):
        feat, _label, case_id = dataset[i]
        out_path = save_dir / f"{case_id}.png"
        if out_path.exists() and not args.exist_ok:
            print(f"{case_id} skipped: heatmap exists")
            continue
        attention = scorer(feat)
        coord_filepath = Path(args.coord_dir) / f"{case_id}.json"
        contours = None
        if args.annotation_dir is not None and getattr(args, "draw_contours", True):
            xml = Path(args.annotation_dir) / f"{case_id}.xml"
            if xml.exists():
                contours = load_annotations_xml(xml)
        heatmap = create_heatmap(coord_filepath, attention,
                                 slide_level=args.slide_level, contours=contours)
        cv2.imwrite(str(out_path), heatmap)
        print(f"{case_id}: heatmap written ({len(attention)} patches)")

"""Face alignment helper: detect -> affine-align -> restore -> paste back.

Behavioral parity target: /root/reference/diffbir/utils/face.py:49-516
(FaceRestoreHelper): 5-landmark affine alignment to the FFHQ template,
eye-distance filtering, inverse-affine paste-back with a soft mask.

Detection backends (tried in order):
- the JAX RetinaFace port (models/retinaface.py) when its weights are in
  ``weights/`` (the TPU-native path);
- a user-provided ``landmarks_fn(img_rgb) -> [N, 5, 2]``;
- facexlib RetinaFace when importable (torch fallback, like the reference);
otherwise calling ``get_face_landmarks_5`` raises with guidance.

Paste-back uses the ParseNet soft mask (models/parsenet.py,
reference face.py:476-509) when parse weights are available, otherwise the
reference's no-parse fallback (eroded + blurred box mask, face.py:430-470).

Image convention: this helper works in RGB uint8 HWC end to end (the repo's
native convention); BGR conversion happens internally where a backend needs
it. The reference resolves the same landmine explicitly at face.py:120-135.

Warping/pasting is host-side cv2 (CPU preprocessing feeding the TPU), like
the reference.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import cv2
import numpy as np

# FFHQ 512x512 5-point template (public constant used by the reference's
# face_template * (face_size / 512), face.py:85-100)
FFHQ_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.19360],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    np.float32,
)


def _weights_path(name: str) -> Optional[str]:
    """Locate a registry checkpoint under weights/ without downloading."""
    import os

    from ..inference.pretrained_models import MODELS, weights_dir

    url = MODELS[name]
    path = os.path.join(weights_dir(), os.path.basename(url.split("?")[0]))
    return path if os.path.exists(path) else None


def load_jax_detector():
    """RetinaFaceDetector from weights/, or None when weights are absent."""
    path = _weights_path("retinaface_resnet50")
    if path is None:
        return None
    import jax

    from ..models.retinaface import RetinaFace, RetinaFaceDetector
    from ..weights import convert

    sd = convert.load_torch_state_dict(path)
    model = RetinaFace()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp_zeros((1, 64, 64, 3))), jax.random.PRNGKey(0)
    )
    params, _, _ = convert.fill_flax_params(shapes, sd, strict=True)
    return RetinaFaceDetector(params)


def load_jax_parser():
    """FaceParser from weights/, or None when weights are absent."""
    path = _weights_path("parsenet")
    if path is None:
        return None
    import jax

    from ..models.parsenet import FaceParser, ParseNet
    from ..weights import convert

    sd = convert.load_torch_state_dict(path)
    model = ParseNet()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp_zeros((1, 512, 512, 3))), jax.random.PRNGKey(0)
    )
    params, _, _ = convert.fill_flax_params(shapes, sd, strict=True)
    return FaceParser(params)


def jnp_zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape, jnp.float32)


class FaceRestoreHelper:
    def __init__(
        self,
        upscale_factor: float = 1.0,
        face_size: int = 512,
        eye_dist_threshold: Optional[float] = 5.0,
        landmarks_fn: Optional[Callable] = None,
        detector=None,
        face_parser=None,
    ):
        self.upscale_factor = upscale_factor
        self.face_size = face_size
        # facexlib detect_faces default conf threshold (reference face.py:209
        # calls it with the default)
        self.det_threshold = 0.8
        self.face_template = FFHQ_TEMPLATE_512 * (face_size / 512.0)
        self.eye_dist_threshold = eye_dist_threshold
        self._landmarks_fn = landmarks_fn
        # detector: object with detect_faces(img_bgr, thr) -> [N, 15]
        self._detector = detector
        # face_parser: object with parse(face_rgb01) -> [H, W] int class map
        self.face_parser = face_parser
        self.input_img: Optional[np.ndarray] = None  # RGB uint8
        self.all_landmarks_5: List[np.ndarray] = []
        self.cropped_faces: List[np.ndarray] = []
        self.restored_faces: List[np.ndarray] = []
        self.affine_matrices: List[np.ndarray] = []
        self.inverse_affine_matrices: List[np.ndarray] = []

    # ------------------------------------------------------------------ #
    def clean_all(self) -> None:
        self.all_landmarks_5, self.cropped_faces = [], []
        self.restored_faces, self.affine_matrices = [], []
        self.inverse_affine_matrices = []

    def read_image(self, img: np.ndarray) -> None:
        """img: uint8 HWC, RGB (the repo convention; grayscale broadcast).

        Small inputs are upscaled so the min side is >= 512 BEFORE detection
        and paste-back (reference face.py:140-142) — detection scale and the
        merged-output geometry match the reference for small images."""
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        if min(img.shape[:2]) < 512:
            f = 512.0 / min(img.shape[:2])
            img = cv2.resize(img, (0, 0), fx=f, fy=f,
                             interpolation=cv2.INTER_LINEAR)
        self.input_img = img

    def _detect(self, img_rgb) -> np.ndarray:
        """img_rgb -> [N, 5, 2] landmarks. Backend order: user fn, JAX
        RetinaFace (weights-gated), facexlib torch."""
        if self._landmarks_fn is not None:
            return np.asarray(self._landmarks_fn(img_rgb))
        if self._detector is None:
            self._detector = load_jax_detector()
        if self._detector is not None:
            bboxes = self._detector.detect_faces(
                img_rgb[:, :, ::-1], self.det_threshold
            )
            return np.array([b[5:15].reshape(5, 2) for b in bboxes])
        try:
            from facexlib.detection import init_detection_model

            if not hasattr(self, "_det_model"):
                self._det_model = init_detection_model("retinaface_resnet50")
            import torch

            with torch.no_grad():
                bboxes = self._det_model.detect_faces(
                    img_rgb[:, :, ::-1], self.det_threshold
                )
            return np.array([b[5:15].reshape(5, 2) for b in bboxes])
        except ImportError as e:
            raise RuntimeError(
                "no face detector available: place the retinaface_resnet50 "
                "checkpoint under weights/, install facexlib, or pass "
                "landmarks_fn(img)->[N,5,2] to FaceRestoreHelper"
            ) from e

    def get_face_landmarks_5(self, resize: Optional[int] = None) -> int:
        """Detect faces; filter small eye distances (face.py:188-309)."""
        img = self.input_img
        scale = 1.0
        if resize is not None:
            h, w = img.shape[:2]
            # reference face.py:201-205: only ever scale UP for detection
            scale = max(1.0, resize / min(h, w))
            if scale != 1.0:
                img = cv2.resize(img, (int(w * scale), int(h * scale)),
                                 interpolation=cv2.INTER_LINEAR)
        landmarks = self._detect(img)
        for lm in landmarks:
            lm = lm / scale
            # reference metric (face.py:212): norm([bbox[6]-bbox[8],
            # bbox[7]-bbox[9]]) = [lm0.y-lm1.y, lm1.x-lm2.x] — NOT the true
            # eye distance (~half of it for frontal faces); replicated
            # exactly so the same faces pass the threshold
            eye_dist = np.linalg.norm(
                [lm[0][1] - lm[1][1], lm[1][0] - lm[2][0]]
            )
            if self.eye_dist_threshold is not None and eye_dist < self.eye_dist_threshold:
                continue
            self.all_landmarks_5.append(lm.astype(np.float32))
        return len(self.all_landmarks_5)

    def align_warp_face(self, border_mode: str = "constant") -> None:
        """Affine-align each face crop to the template (face.py:311-341)."""
        modes = {
            "constant": cv2.BORDER_CONSTANT,
            "reflect101": cv2.BORDER_REFLECT101,
            "reflect": cv2.BORDER_REFLECT,
        }
        for lm in self.all_landmarks_5:
            affine, _ = cv2.estimateAffinePartial2D(
                lm, self.face_template, method=cv2.LMEDS
            )
            self.affine_matrices.append(affine)
            cropped = cv2.warpAffine(
                self.input_img, affine, (self.face_size, self.face_size),
                borderMode=modes[border_mode], borderValue=(135, 133, 132),
            )
            self.cropped_faces.append(cropped)

    def add_restored_face(self, face: np.ndarray) -> None:
        self.restored_faces.append(face)

    def get_inverse_affine(self) -> None:
        for affine in self.affine_matrices:
            inv = cv2.invertAffineTransform(affine)
            inv *= self.upscale_factor
            self.inverse_affine_matrices.append(inv)

    def paste_faces_to_input_image(
        self, upsample_img: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Soft-mask paste-back at upscale resolution (face.py:364-509).

        With ``face_parser`` set, the fusion mask is min(parse-net soft mask,
        box mask) exactly like the reference's use_parse branch
        (face.py:476-509); otherwise the no-parse eroded+blurred box mask.
        """
        h, w = self.input_img.shape[:2]
        h_up = int(h * self.upscale_factor)
        w_up = int(w * self.upscale_factor)
        if upsample_img is None:
            upsample_img = cv2.resize(
                self.input_img, (w_up, h_up), interpolation=cv2.INTER_LANCZOS4
            )
        else:
            upsample_img = cv2.resize(
                upsample_img, (w_up, h_up), interpolation=cv2.INTER_LANCZOS4
            )
        upsample_img = upsample_img.astype(np.float32)
        for face, inv in zip(self.restored_faces, self.inverse_affine_matrices):
            # extra offset like the reference when upscale > 1
            if self.upscale_factor > 1:
                inv = inv.copy()
                inv[:, 2] += 0.5 * self.upscale_factor
            inv_restored = cv2.warpAffine(face.astype(np.float32), inv, (w_up, h_up))
            mask = np.ones((self.face_size, self.face_size), np.float32)
            inv_mask = cv2.warpAffine(mask, inv, (w_up, h_up))
            # erode borders then blur (box soft mask)
            erosion = max(1, int(2 * self.upscale_factor))
            inv_mask_erosion = cv2.erode(
                inv_mask, np.ones((erosion, erosion), np.uint8)
            )
            total_face_area = np.sum(inv_mask_erosion)
            w_edge = int(total_face_area**0.5) // 20
            radius = max(w_edge * 2, 1)
            inv_mask_center = cv2.erode(
                inv_mask_erosion, np.ones((radius, radius), np.uint8)
            )
            blur_size = w_edge * 2 + 1
            inv_soft_mask = cv2.GaussianBlur(
                inv_mask_center, (blur_size, blur_size), 0
            )[:, :, None]
            if self.face_parser is not None:
                inv_soft_mask = self._fuse_parse_mask(
                    face, inv, inv_soft_mask, (w_up, h_up)
                )
            upsample_img = inv_soft_mask * inv_restored + (1 - inv_soft_mask) * upsample_img
        return np.clip(upsample_img, 0, 255).astype(np.uint8)

    # 19-class -> keep/drop map: background(0), neck(14), eyeglasses-frame...
    # identical to the reference MASK_COLORMAP (face.py:461)
    MASK_COLORMAP = np.array(
        [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
         0, 255, 0, 0, 0],
        np.float32,
    )

    def _fuse_parse_mask(self, face, inv, inv_soft_mask, size_up):
        """Parse-net soft mask fused with the box mask (face.py:476-509)."""
        w_up, h_up = size_up
        face_512 = cv2.resize(face, (512, 512), interpolation=cv2.INTER_LINEAR)
        classes = np.asarray(self.face_parser.parse(face_512.astype(np.float32) / 255.0))
        parse_mask = self.MASK_COLORMAP[classes]
        parse_mask = cv2.GaussianBlur(parse_mask, (101, 101), 11)
        parse_mask = cv2.GaussianBlur(parse_mask, (101, 101), 11)
        thres = 10
        parse_mask[:thres, :] = 0
        parse_mask[-thres:, :] = 0
        parse_mask[:, :thres] = 0
        parse_mask[:, -thres:] = 0
        parse_mask = parse_mask / 255.0
        parse_mask = cv2.resize(parse_mask, (self.face_size, self.face_size))
        parse_mask = cv2.warpAffine(parse_mask, inv, (w_up, h_up), flags=3)
        inv_soft_parse_mask = parse_mask[:, :, None]
        fuse = (inv_soft_parse_mask < inv_soft_mask).astype(np.float32)
        return inv_soft_parse_mask * fuse + inv_soft_mask * (1 - fuse)

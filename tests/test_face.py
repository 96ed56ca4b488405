"""Face stack: RetinaFace + ParseNet flax ports and the unaligned-BFR
paste-back path (synthetic weights — VERDICT r1 missing #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.parsenet import FaceParser, ParseNet
from diffbir_tpu.models.retinaface import (
    RetinaFace,
    RetinaFaceDetector,
    decode_boxes,
    nms,
    prior_boxes,
)
from diffbir_tpu.utils.face import FaceRestoreHelper


@pytest.fixture(scope="module")
def retinaface():
    model = RetinaFace()
    # jit everything: eager flax init/apply of a resnet-50-scale model takes
    # minutes on this 1-vCPU host (CLAUDE.md)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_retinaface_forward_shapes(retinaface):
    model, params = retinaface
    loc, conf, landms = jax.jit(model.apply)(params, jnp.zeros((1, 64, 64, 3)))
    # anchors at 64x64: (8^2 + 4^2 + 2^2) * 2 = 168
    assert loc.shape == (1, 168, 4)
    assert conf.shape == (1, 168, 2)
    assert landms.shape == (1, 168, 10)


def test_prior_boxes_match_head_count(retinaface):
    model, params = retinaface
    for h, w in [(64, 64), (96, 64), (160, 128)]:
        loc, _, _ = jax.jit(model.apply)(params, jnp.zeros((1, h, w, 3)))
        assert prior_boxes(h, w).shape == (loc.shape[1], 4)


def test_decode_and_nms_roundtrip():
    priors = prior_boxes(64, 64)
    loc = np.zeros((priors.shape[0], 4), np.float32)
    boxes = decode_boxes(loc, priors)  # zero loc -> the priors as corners
    assert np.all(boxes[:, 2] > boxes[:, 0]) and np.all(boxes[:, 3] > boxes[:, 1])
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]],
        np.float32,
    )
    keep = nms(dets, 0.4)
    assert keep == [0, 2]  # the overlapping lower-score box is suppressed


def test_detector_contract(retinaface):
    _, params = retinaface
    det = RetinaFaceDetector(params)
    out = det.detect_faces(
        (np.random.default_rng(0).random((70, 90, 3)) * 255).astype(np.uint8), 0.97
    )
    assert out.ndim == 2 and out.shape[1] == 15  # x1y1x2y2 score + 5 lms


TINY_PARSE = dict(in_size=64, out_size=64, min_feat_size=16, base_ch=16,
                  res_depth=2, ch_range=(16, 64))


def test_parsenet_shapes():
    model = ParseNet(**TINY_PARSE)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    mask, img = jax.jit(model.apply)(params, jnp.zeros((2, 64, 64, 3)))
    assert mask.shape == (2, 64, 64, 19)
    assert img.shape == (2, 64, 64, 3)


def test_face_parser_classmap():
    model = ParseNet(**TINY_PARSE)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    parser = FaceParser(params, model=model)
    classes = parser.parse(np.random.default_rng(3).random((64, 64, 3)))
    assert classes.shape == (64, 64)
    assert classes.dtype == np.int32
    assert classes.min() >= 0 and classes.max() < 19


def _one_face_landmarks(img):
    """Synthetic 5-point landmarks roughly centered in the image."""
    h, w = img.shape[:2]
    cx, cy = w / 2, h / 2
    return np.array(
        [[[cx - 30, cy - 20], [cx + 30, cy - 20], [cx, cy + 5],
          [cx - 20, cy + 30], [cx + 20, cy + 30]]],
        np.float32,
    )


def test_unaligned_face_e2e_with_parse_mask():
    """detect (synthetic) -> align -> 'restore' -> parse-mask paste-back:
    the full unaligned-BFR helper path including _fuse_parse_mask."""
    model = ParseNet(**TINY_PARSE)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))

    class TinyParser:
        def parse(self, face_rgb01):
            # tiny net expects 64^2; the helper hands 512^2 — downscale
            import cv2

            small = cv2.resize(np.asarray(face_rgb01, np.float32), (64, 64))
            cls = FaceParser(params, model=model).parse(small)
            return cv2.resize(cls.astype(np.uint8), face_rgb01.shape[1::-1],
                              interpolation=cv2.INTER_NEAREST).astype(np.int32)

    helper = FaceRestoreHelper(
        upscale_factor=1.0, face_size=512,
        landmarks_fn=_one_face_landmarks, face_parser=TinyParser(),
    )
    img = (np.random.default_rng(5).random((256, 256, 3)) * 255).astype(np.uint8)
    helper.read_image(img)
    # reference parity: inputs are upscaled to min side 512 before detection
    base = helper.input_img
    assert base.shape == (512, 512, 3)
    n = helper.get_face_landmarks_5()
    assert n == 1
    helper.align_warp_face()
    assert helper.cropped_faces[0].shape == (512, 512, 3)
    restored = np.clip(
        helper.cropped_faces[0].astype(np.float32) * 1.1, 0, 255
    ).astype(np.uint8)
    helper.add_restored_face(restored)
    helper.get_inverse_affine()
    merged = helper.paste_faces_to_input_image()
    assert merged.shape == (512, 512, 3) and merged.dtype == np.uint8
    # the face region changed, distant corners did not
    assert np.any(merged[200:320, 200:320] != base[200:320, 200:320])
    np.testing.assert_array_equal(merged[:10, :10], base[:10, :10])


def test_no_parse_fallback_paste():
    helper = FaceRestoreHelper(
        upscale_factor=2.0, face_size=512, landmarks_fn=_one_face_landmarks
    )
    img = (np.random.default_rng(6).random((128, 128, 3)) * 255).astype(np.uint8)
    helper.read_image(img)  # -> min side 512 (reference parity)
    assert helper.get_face_landmarks_5() == 1
    helper.align_warp_face()
    helper.add_restored_face(helper.cropped_faces[0])
    helper.get_inverse_affine()
    merged = helper.paste_faces_to_input_image()
    assert merged.shape == (1024, 1024, 3)  # 512 * upscale 2

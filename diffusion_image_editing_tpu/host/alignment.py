"""FFHQ-style face alignment (host-side preprocessing stage).

Rebuild of `src/alignment.py` + `src/real_image_editing_utils.py` of the
reference (itself from omertov/encoder4editing): 68-landmark geometry ->
oriented quad -> shrink / crop / reflect-pad+blur -> QUAD warp to the target
resolution. The landmark detector is pluggable: dlib when installed (the
reference hard-depends on it; this environment has none), or any callable
returning a (68, 2) array — `landmarks_from_parsing` derives workable
eye/mouth anchor points from a BiSeNet parsing map so the fully TPU-native
stack needs no dlib at all.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import numpy as np
import PIL.Image
import scipy.ndimage

LandmarkFn = Callable[[np.ndarray], np.ndarray]  # RGB uint8 HWC -> (68, 2)


def dlib_landmarker(predictor_path: str) -> LandmarkFn:
    """dlib 68-landmark detector (`alignment.py:10-27`); requires dlib."""
    import dlib  # optional dependency

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(predictor_path)

    def fn(img: np.ndarray) -> np.ndarray:
        dets = detector(img, 1)
        if len(dets) == 0:
            raise ValueError("no face detected")
        shape = predictor(img, dets[-1])
        return np.array([[p.x, p.y] for p in shape.parts()])

    return fn


# CelebAMask-HQ class ids (utils/constants.py)
_L_EYE, _R_EYE, _MOUTH, _U_LIP, _L_LIP = 4, 5, 11, 12, 13


def landmarks_from_parsing(parsing: np.ndarray) -> np.ndarray:
    """Derive the alignment anchor points from a face-parsing map.

    `align_quad` only consumes mean(eye_left), mean(eye_right), and the outer
    mouth corners, so a synthetic 68-point array carrying those in the right
    slots reproduces the crop geometry without dlib."""

    def centroid(cls):
        ys, xs = np.nonzero(parsing == cls)
        if len(xs) == 0:
            raise ValueError(f"class {cls} absent from parsing map")
        return np.array([xs.mean(), ys.mean()])

    eye_l = centroid(_L_EYE)
    eye_r = centroid(_R_EYE)
    mouth = np.nonzero(np.isin(parsing, (_MOUTH, _U_LIP, _L_LIP)))
    if len(mouth[0]) == 0:
        raise ValueError("mouth absent from parsing map")
    mxs, mys = mouth[1], mouth[0]
    mouth_left = np.array([mxs.min(), mys[np.argmin(mxs)]])
    mouth_right = np.array([mxs.max(), mys[np.argmax(mxs)]])

    lm = np.zeros((68, 2))
    lm[36:42] = eye_l
    lm[42:48] = eye_r
    lm[48] = mouth_left
    lm[54] = mouth_right
    return lm


def align_quad(lm: np.ndarray):
    """Oriented crop rectangle from landmarks (`alignment.py:47-66`)."""
    eye_left = np.mean(lm[36:42], axis=0)
    eye_right = np.mean(lm[42:48], axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[48] + lm[54]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = np.hypot(*x) * 2
    return quad, qsize


def align_face(
    img: Union[str, PIL.Image.Image],
    landmarks: Optional[np.ndarray] = None,
    landmark_fn: Optional[LandmarkFn] = None,
    output_size: int = 256,
    transform_size: int = 256,
    enable_padding: bool = True,
) -> PIL.Image.Image:
    """FFHQ alignment (`alignment.py:30-146`): shrink, border crop,
    reflect-pad with blur falloff, QUAD warp."""
    if isinstance(img, str):
        img = PIL.Image.open(img)
    img = img.convert("RGB")
    if landmarks is None:
        if landmark_fn is None:
            raise ValueError("need landmarks or a landmark_fn")
        landmarks = landmark_fn(np.asarray(img))
    quad, qsize = align_quad(np.asarray(landmarks, np.float64))

    # Shrink.
    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (
            int(np.rint(float(img.size[0]) / shrink)),
            int(np.rint(float(img.size[1]) / shrink)),
        )
        img = img.resize(rsize, PIL.Image.LANCZOS)
        quad = quad / shrink
        qsize /= shrink

    # Crop.
    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    crop = (
        max(crop[0] - border, 0), max(crop[1] - border, 0),
        min(crop[2] + border, img.size[0]), min(crop[3] + border, img.size[1]),
    )
    if crop[2] - crop[0] < img.size[0] or crop[3] - crop[1] < img.size[1]:
        img = img.crop(crop)
        quad -= crop[0:2]

    # Pad.
    pad = (
        int(np.floor(min(quad[:, 0]))), int(np.floor(min(quad[:, 1]))),
        int(np.ceil(max(quad[:, 0]))), int(np.ceil(max(quad[:, 1]))),
    )
    pad = (
        max(-pad[0] + border, 0), max(-pad[1] + border, 0),
        max(pad[2] - img.size[0] + border, 0), max(pad[3] - img.size[1] + border, 0),
    )
    if enable_padding and max(pad) > border - 4:
        pad = np.maximum(pad, int(np.rint(qsize * 0.3)))
        arr = np.pad(
            np.float32(img), ((pad[1], pad[3]), (pad[0], pad[2]), (0, 0)), "reflect"
        )
        h, w, _ = arr.shape
        y, x, _ = np.ogrid[:h, :w, :1]
        with np.errstate(divide="ignore", invalid="ignore"):
            mask = np.maximum(
                1.0 - np.minimum(np.float32(x) / pad[0], np.float32(w - 1 - x) / pad[2]),
                1.0 - np.minimum(np.float32(y) / pad[1], np.float32(h - 1 - y) / pad[3]),
            )
        mask = np.nan_to_num(mask, nan=1.0, posinf=1.0, neginf=1.0)
        blur = qsize * 0.02
        arr += (scipy.ndimage.gaussian_filter(arr, [blur, blur, 0]) - arr) * np.clip(
            mask * 3.0 + 1.0, 0.0, 1.0
        )
        arr += (np.median(arr, axis=(0, 1)) - arr) * np.clip(mask, 0.0, 1.0)
        img = PIL.Image.fromarray(np.uint8(np.clip(np.rint(arr), 0, 255)), "RGB")
        quad += pad[:2]

    # Transform.
    img = img.transform(
        (transform_size, transform_size), PIL.Image.QUAD,
        (quad + 0.5).flatten(), PIL.Image.BILINEAR,
    )
    if output_size < transform_size:
        img = img.resize((output_size, output_size), PIL.Image.LANCZOS)
    return img


def prepare_real_image_for_editing(
    image_path: str,
    landmark_fn: Optional[LandmarkFn] = None,
    landmarks: Optional[np.ndarray] = None,
    output_size: int = 256,
) -> np.ndarray:
    """Align then convert to [-1,1] NHWC float32
    (`real_image_editing_utils.py:18-24`, minus the hardcoded cuda copy)."""
    from .transforms import pil_to_array

    aligned = align_face(
        image_path, landmarks=landmarks, landmark_fn=landmark_fn,
        output_size=output_size, transform_size=output_size,
    )
    return pil_to_array(aligned)

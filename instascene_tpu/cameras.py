"""Camera model and matrix conventions.

Convention note (differs in storage, not math, from the reference): the reference
stores transposed matrices because its CUDA kernels index flat arrays column-first
(scene/cameras.py:81-86, cuda_rasterizer/auxiliary.h:80-99). Here all matrices are
conventional row-major maps acting on column vectors:

    p_view_h = w2v @ p_world_h          (getWorld2View2 parity, graphics_utils.py:38)
    p_clip   = proj @ p_view_h          (getProjectionMatrix parity, :51-71)
    full_proj = proj @ w2v
    x_pix = ((x_ndc + 1) * W - 1) / 2   (ndc2Pix, auxiliary.h:63-66)

so `w2v` equals the reference's `world_view_transform.T` etc.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_world2view(R: np.ndarray, t: np.ndarray,
                   translate=np.array([0.0, 0.0, 0.0]), scale=1.0) -> np.ndarray:
    """World→view 4x4. R is the COLMAP-reader convention rotation (c2w rotation,
    i.e. w2c[:3,:3].T); t is the w2c translation. Parity: graphics_utils.py:38-49."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w).astype(np.float32)


def get_projection_matrix(znear: float, zfar: float, fovx: float,
                          fovy: float) -> np.ndarray:
    """Perspective view→NDC clip matrix. Parity: graphics_utils.py:51-71.
    Maps view z to ndc z in [0, 1]-ish range with w = z_view."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def ndc2pix_matrix(width: int, height: int) -> np.ndarray:
    """Rows mapping clip coords (x,y,·,w) → (x_pix·w, y_pix·w, w). 3x4.
    Parity: compute_transmat's ndc2pix (cuda_rasterizer/forward.cu:106-110)."""
    return np.array([
        [width / 2.0, 0, 0, (width - 1) / 2.0],
        [0, height / 2.0, 0, (height - 1) / 2.0],
        [0, 0, 0, 1.0]], dtype=np.float32)


@dataclass
class Camera:
    """A calibrated training/eval camera with (optionally) loaded priors.

    Arrays are host numpy; the jit-facing subset is exported by render-time
    helpers. Images are channels-last [H, W, C] float32 in [0, 1]."""
    uid: int
    colmap_id: int
    R: np.ndarray            # c2w rotation (COLMAP-reader convention)
    T: np.ndarray            # w2c translation
    fovx: float
    fovy: float
    image_name: str
    width: int
    height: int
    image: Optional[np.ndarray] = None           # [H,W,3] f32
    gt_alpha_mask: Optional[np.ndarray] = None   # [H,W,1] f32
    normal: Optional[np.ndarray] = None          # [H,W,3] f32, world frame, unit
    normal_mask: Optional[np.ndarray] = None     # [H,W] bool
    segmap: Optional[np.ndarray] = None          # [H,W] int32
    sorted_segmap: Optional[np.ndarray] = None   # [H,W] int32
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        if self.image is not None:
            self.image = np.clip(self.image, 0.0, 1.0)
            self.height, self.width = self.image.shape[:2]
        if self.normal is not None:
            # normalize + validity mask (reference scene/cameras.py:49-56)
            norm = np.linalg.norm(self.normal, axis=-1, keepdims=True)
            self.normal_mask = ~((norm[..., 0] > 1.1) | (norm[..., 0] < 0.9))
            self.normal = self.normal / np.maximum(norm, 1e-12)
        self.w2v = get_world2view(self.R, self.T, self.trans, self.scale)
        self.proj = get_projection_matrix(self.znear, self.zfar, self.fovx,
                                          self.fovy)
        self.full_proj = (self.proj @ self.w2v).astype(np.float32)
        self.camera_center = np.linalg.inv(self.w2v)[:3, 3].astype(np.float32)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> float:
        return self.width / (2 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2 * self.tanfovy)

    @property
    def intrinsic(self) -> np.ndarray:
        K = np.eye(4)
        K[0, 0] = fov2focal(self.fovx, self.width)
        K[1, 1] = fov2focal(self.fovy, self.height)
        K[0, 2] = self.width / 2
        K[1, 2] = self.height / 2
        return K

    @property
    def w2c(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.R.T
        m[:3, 3] = self.T
        return m

    @property
    def c2w(self) -> np.ndarray:
        return np.linalg.inv(self.w2c)


@dataclass
class MiniCam:
    """Camera defined directly by matrices (viewer path; reference cameras.py:180)."""
    width: int
    height: int
    fovy: float
    fovx: float
    znear: float
    zfar: float
    w2v: np.ndarray
    full_proj: np.ndarray

    def __post_init__(self):
        self.camera_center = np.linalg.inv(self.w2v)[:3, 3].astype(np.float32)

    @property
    def c2w(self) -> np.ndarray:
        return np.linalg.inv(self.w2v)

    tanfovx = Camera.tanfovx
    tanfovy = Camera.tanfovy
    focal_x = Camera.focal_x
    focal_y = Camera.focal_y


def load_camera(args, uid: int, cam_info, resolution_scale: float = 1.0,
                load_images: bool = True) -> Camera:
    """Build a Camera from a CameraInfo, applying the reference resolution rules
    (utils/camera_utils.py:25-102): -1 auto-caps width at 1600; 1/2/4/8 divide;
    other values are a target width. Loads normal priors and segmaps."""
    from PIL import Image

    from .utils.general import pil_to_array

    pil_image = Image.open(cam_info.image_path)
    orig_w, orig_h = pil_image.size

    if args.resolution in (1, 2, 4, 8):
        resolution = (round(orig_w / (resolution_scale * args.resolution)),
                      round(orig_h / (resolution_scale * args.resolution)))
    else:
        if args.resolution == -1:
            global_down = orig_w / 1600 if orig_w > 1600 else 1
        else:
            global_down = orig_w / args.resolution
        s = float(global_down) * float(resolution_scale)
        resolution = (int(orig_w / s), int(orig_h / s))

    bands = pil_image.split()
    if len(bands) > 3:
        rgb = pil_to_array(Image.merge("RGB", bands[:3]), resolution)
        alpha = pil_to_array(bands[3], resolution)
    else:
        rgb = pil_to_array(pil_image.convert("RGB"), resolution)
        alpha = None

    normal = None
    segmap = None
    sorted_segmap = None
    if load_images:
        if getattr(args, "w_normal_prior", None):
            normal = _load_normal_prior(args, cam_info, resolution)
        segmap = _load_segmap(args, cam_info, resolution)
        sorted_segmap = _load_segmap(args, cam_info, resolution,
                                     override_dir="sam/mask_sorted")

    return Camera(uid=uid, colmap_id=cam_info.uid, R=cam_info.R, T=cam_info.T,
                  fovx=cam_info.FovX, fovy=cam_info.FovY,
                  image_name=cam_info.image_name,
                  width=resolution[0], height=resolution[1],
                  image=rgb, gt_alpha_mask=alpha, normal=normal,
                  segmap=segmap, sorted_segmap=sorted_segmap)


def _load_normal_prior(args, cam_info, resolution):
    """Load mono-normal prior png/npy, flip to camera-out convention, rotate to
    world frame (utils/camera_utils.py:63-78)."""
    from PIL import Image

    from .utils.general import pil_to_array

    normal_path = os.path.join(
        os.path.dirname(os.path.dirname(cam_info.image_path)),
        args.w_normal_prior, os.path.basename(cam_info.image_path))
    base = normal_path[:-4]
    if os.path.exists(base + ".npy"):
        n = np.load(base + ".npy")  # [H,W,3] or [3,H,W] in [0,1]
        if n.shape[0] == 3 and n.ndim == 3:
            n = n.transpose(1, 2, 0)
        n = -(n * 2 - 1)
        import cv2
        n = cv2.resize(n.astype(np.float32), resolution,
                       interpolation=cv2.INTER_CUBIC)
    elif os.path.exists(base + ".png"):
        img = pil_to_array(Image.open(base + ".png"), resolution)[..., :3]
        n = -(img * 2 - 1)
    else:
        return None
    # rotate from camera to world: n_world = n_cam @ inv(R) (camera_utils.py:77)
    n = n @ np.linalg.inv(cam_info.R).astype(np.float32)
    return n.astype(np.float32)


def _load_segmap(args, cam_info, resolution, override_dir: Optional[str] = None):
    """Load instance label map, NEAREST-resized, unscaled ints
    (utils/camera_utils.py:82-96)."""
    from PIL import Image

    from .utils.general import pil_to_array

    if not getattr(args, "use_seg_feature", False) and override_dir is None:
        return None
    segmap_name = os.path.basename(cam_info.image_path).split(".")[0] + ".png"
    if override_dir is None:
        segmap_type = ("mask_filtered"
                       if (os.path.exists(os.path.join(args.source_path,
                                                       "sam/mask_filtered"))
                           and getattr(args, "load_filter_segmap", False))
                       else "mask")
        seg_dir = f"sam/{segmap_type}"
    else:
        seg_dir = override_dir
    segmap_path = os.path.join(args.source_path, seg_dir, segmap_name)
    if not os.path.exists(segmap_path):
        return None
    arr = pil_to_array(Image.open(segmap_path), resolution,
                       resize_nearest=True, scale=False)
    return arr[..., 0].astype(np.int32) if arr.ndim == 3 else arr.astype(np.int32)

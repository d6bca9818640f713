"""Image utilities: PSNR (see losses.py), viewer render-mode maps, colormaps.

Parity: reference utils/image_utils.py (render_net_image :47) and
utils/general_utils.py colormap; vis_utils/color_utils.py."""

from __future__ import annotations

import numpy as np


def colormap(img: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    """[H,W] → [H,W,3] float colormap via matplotlib."""
    import matplotlib.cm as cm
    mapper = cm.get_cmap(cmap)
    x = np.asarray(img, np.float32)
    return mapper(np.clip(x, 0, 1))[..., :3].astype(np.float32)


def render_net_image(render_pkg: dict, render_items, render_mode, camera
                     ) -> np.ndarray:
    """Select the viewer output map (reference image_utils.py:47-75).
    Returns [H,W,3] float in [0,1]."""
    output = render_items[render_mode].lower() if isinstance(
        render_mode, int) else str(render_mode).lower()
    if output == "alpha":
        net = np.repeat(np.asarray(render_pkg["rend_alpha"]), 3, axis=-1)
    elif output == "normal":
        net = np.asarray(render_pkg["rend_normal"]) * 0.5 + 0.5
    elif output == "depth":
        d = np.asarray(render_pkg["surf_depth"])[..., 0]
        net = colormap(d / max(float(d.max()), 1e-6))
    elif output in ("edge", "curvature"):
        d = np.asarray(render_pkg["surf_depth"])[..., 0]
        gy, gx = np.gradient(d)
        mag = np.sqrt(gx ** 2 + gy ** 2)
        net = colormap(mag / max(float(mag.max()), 1e-6))
    else:
        net = np.asarray(render_pkg["render"])
    return np.clip(net, 0, 1)


def mask_to_rgb(mask: np.ndarray) -> np.ndarray:
    """Instance label map → hsv-colored uint8 RGB
    (utils/contrastive_utils.py:119-125)."""
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt
    num = int(mask.max()) + 1
    colors = plt.get_cmap("hsv", max(num, 2))
    norm = mcolors.Normalize(vmin=0, vmax=max(num - 1, 1))
    return np.uint8(colors(norm(mask))[..., :3] * 255.0)

from .camera import (
    Camera,
    default_intrinsics,
    generate_rays,
    reference_calibration,
)
from .pipeline import (
    RenderConfig,
    render,
    render_aovs,
    render_image,
    render_image_path_traced,
    render_image_whitted,
)
from .renderer import (
    Hit,
    HitAttributes,
    cast_rays_brute,
    cast_rays_bvh,
    get_cast_fn,
    hit_attributes,
)
from .shade import shade_primary

__all__ = [
    "Camera",
    "Hit",
    "HitAttributes",
    "RenderConfig",
    "render_image_path_traced",
    "render_image_whitted",
    "cast_rays_brute",
    "cast_rays_bvh",
    "default_intrinsics",
    "generate_rays",
    "get_cast_fn",
    "hit_attributes",
    "reference_calibration",
    "render",
    "render_aovs",
    "render_image",
    "shade_primary",
]

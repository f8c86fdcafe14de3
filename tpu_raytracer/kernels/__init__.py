from .traversal import cast_rays_pallas

__all__ = ["cast_rays_pallas"]

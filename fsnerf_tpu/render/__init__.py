"""Rendering layer (reference: src/render/rendering.py)."""

from fsnerf_tpu.render.renderer import (
    render_rays_occgrid,
    render_rays_hierarchical,
    render_frame,
    render_path,
    render_video,
    to8b,
)

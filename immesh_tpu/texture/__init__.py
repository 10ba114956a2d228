from immesh_tpu.texture.camera import PinholeCamera, project_points, bilinear_sample
from immesh_tpu.texture.render import ColorStore, render_points
from immesh_tpu.texture.optical_flow import build_pyramid, lk_track

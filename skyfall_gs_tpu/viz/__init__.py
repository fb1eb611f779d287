from skyfall_gs_tpu.viz.paths import gen_orbit_path, parse_trajectory_json, save_orbit_path
from skyfall_gs_tpu.viz.colormap import colorize_depth
from skyfall_gs_tpu.viz.video import render_trajectory, write_video

__all__ = [
    "gen_orbit_path",
    "parse_trajectory_json",
    "save_orbit_path",
    "colorize_depth",
    "render_trajectory",
    "write_video",
]

"""Fused-PLY export CLI: bake the 3D filter (and optionally appearance)
into a viewer-compatible point cloud.

Capability parity: reference create_fused_ply.py:8-31.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", "-c", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, required=True)
    parser.add_argument("--color_mapped", action="store_true",
                        help="bake the appearance MLP into the SH colors")
    args = parser.parse_args(argv)

    from skyfall_gs_tpu.cli.render_video import load_state_from_checkpoint
    from skyfall_gs_tpu.io.gaussian_ply import save_fused_ply, save_splat

    state, it = load_state_from_checkpoint(args.checkpoint)
    print(f"loaded checkpoint at iteration {it}; "
          f"{int(state.num_alive)} gaussians")
    if args.output.endswith(".splat"):
        # Web-viewer binary format (beyond reference parity); filter is
        # baked exactly like the fused PLY, SH band 0 only by design.
        save_splat(state, args.output)
    else:
        save_fused_ply(state, args.output, color_mapped=args.color_mapped)
    print("wrote", args.output)


if __name__ == "__main__":
    main()

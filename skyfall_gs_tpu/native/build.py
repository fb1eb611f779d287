"""Build the native library: ``python -m skyfall_gs_tpu.native.build``."""

from skyfall_gs_tpu.native import build

if __name__ == "__main__":
    print("built", build(verbose=True))

"""libde265_tpu — TPU-native HEVC/H.265 codec framework.

A from-scratch re-design of the capabilities of strukturag/libde265:
- `native/`: C++17 host core — NAL/CABAC/syntax front-end that emits per-
  picture FrameProgram tensors, a bit-exact scalar pixel backend, and a
  de265.h-compatible C ABI (drop-in for dec265 / libheif / GStreamer).
- `libde265_tpu.decoder`: Python bindings and the FrameProgram tensor feed.
- `libde265_tpu.ops`: JAX/XLA pixel kernels (dequant+IDCT+add, motion
  compensation, intra prediction, deblocking, SAO) — integer bit-exact.
- `libde265_tpu.pipeline`: whole-picture JAX reconstruction pipeline.
- `libde265_tpu.parallel`: tile/frame sharding across a TPU mesh.
"""

from .decoder import Decoder, FrameProgramData, Picture  # noqa: F401
from .encoder import Encoder  # noqa: F401

__version__ = "0.1.0"

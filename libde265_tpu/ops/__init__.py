"""JAX/XLA integer pixel kernels for the HEVC reconstruction pipeline.

All kernels are bit-exact integer re-designs of the reference DSP functions
(/root/reference/libde265/fallback-*.cc), batched over whole pictures for the
TPU: the host CABAC front-end emits FrameProgram tensors, and these ops
consume them size-binned (dense blocks, static shapes) so XLA can tile them
onto the MXU/VPU.
"""

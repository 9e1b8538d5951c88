"""Pallas TPU kernels: the native compute layer.

Replaces the reference's SIMD quant kernels + threaded matmul inner loops
(SURVEY §2.3, §2.8) with fused TPU kernels: packed blocks stay in HBM,
are DMA'd and unpacked in VMEM, and feed the MXU directly.
"""

"""GGML_OP_CONV_1D_1S / CONV_1D_2S (declared but stubbed in the reference,
Ggml.cs:8712-8723; work-size budget at Ggml.cs:3420-3452).

ggml semantics: kernel a = [kw, in_c, out_c] (ne order), signal b = [L, in_c];
conv_1d_1s → [L, out_c] (stride 1, half padding); conv_1d_2s → [L/2, out_c]
(stride 2). In jnp convention: x [..., L, in_c], w [out_c, in_c, kw]. Lowers
to lax.conv_general_dilated which XLA maps onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_1d(x, w, stride: int = 1):
    """x: [B?, L, in_c]; w: [out_c, in_c, kw] → [B?, ceil(L/stride), out_c]."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    kw = w.shape[-1]
    pad = kw // 2
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride,),
        padding=[(pad, pad - (1 - kw % 2))] if kw % 2 == 0 else [(pad, pad)],
        dimension_numbers=("NWC", "OIW", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return out[0] if squeeze else out


def conv_1d_1s(x, w):
    return conv_1d(x, w, stride=1)


def conv_1d_2s(x, w):
    return conv_1d(x, w, stride=2)

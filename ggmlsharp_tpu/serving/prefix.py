"""Prefix caching — precomputed KV rows for shared prompt prefixes
(register_prefix/drop_prefix + per-admission install). Split from
engine.py (r4)."""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kv_cache as kvc
from .common import _bucket


class PrefixCacheMixin:
    def _compute_prefix_rows(self, fwd, cfg, params, proto, tokens,
                             plen: int) -> dict:
        """Prefill `tokens` into a fresh 1-slot cache matching `proto`'s
        layout and return exactly the prefix rows + last-token logits."""
        bucket = min(_bucket(plen), self.max_len)
        n_head_kv = getattr(cfg, "n_head_kv", cfg.n_head)

        @partial(jax.jit, static_argnames=("plen",))
        def reg(params, toks, plen):
            cache = kvc.init_cache(
                cfg.n_layer, 1, n_head_kv, bucket, cfg.head_dim,
                dtype=proto.k[0].dtype if not proto.int8 else jnp.bfloat16,
                int8=proto.int8, flat=kvc.is_flat(proto),
            )
            positions = jnp.arange(bucket, dtype=jnp.int32)[None]
            logits, c2 = fwd(params, cfg, toks, cache, positions,
                             prefix_bound=bucket)

            def cut(t):  # keep exactly the prefix rows (time axis 1 or 2)
                return None if t is None else tuple(
                    jax.lax.slice_in_dim(x, 0, plen,
                                         axis=1 if x.ndim == 3 else 2)
                    for x in t)

            return (logits[:, plen - 1, :], cut(c2.k), cut(c2.v),
                    cut(c2.k_scale), cut(c2.v_scale))

        toks = np.zeros((1, bucket), np.int32)
        toks[0, :plen] = tokens
        last, k, v, ks, vs = reg(params, jnp.asarray(toks), plen=plen)
        return dict(k=k, v=v, ks=ks, vs=vs, last=last[0])

    def register_prefix(self, tokens: list) -> int:
        """Prefill a shared prompt prefix ONCE and keep its KV rows on
        device; requests carrying the returned id skip recomputing it —
        admission installs the rows into the slot with one
        dynamic_update_slice per buffer and prefills only the remainder.
        In speculative mode the draft model's rows are registered too.
        Compiles one registration executable per distinct prefix length."""
        plen = len(tokens)
        if not 0 < plen < self.max_len:
            raise ValueError(f"prefix length {plen} must be in (0, "
                             f"{self.max_len})")
        entry = dict(
            tokens=list(tokens), plen=plen,
            t=self._compute_prefix_rows(self.forward, self.cfg, self.params,
                                        self.cache, tokens, plen),
            d=(self._compute_prefix_rows(self.d_forward, self.d_cfg,
                                         self.d_params, self.d_cache,
                                         tokens, plen)
               if self.spec else None),
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = entry
        return pid

    def drop_prefix(self, prefix_id: int):
        self._prefixes.pop(prefix_id, None)

    def _install_prefix(self, rows: dict, plen: int, slot: int,
                        set_len: int, draft: bool = False):
        """Write `rows` into cache rows [0:plen] of `slot` and set its
        length to `set_len` (traced — the draft cache sits one token behind
        when the prompt IS the prefix)."""
        key = (plen, draft)
        install = self._compiled_install.get(key)
        if install is None:

            @partial(jax.jit, donate_argnums=(0,))
            def install(cache, k, v, ks, vs, slot, set_len):
                def upd(bufs, rows):
                    if bufs is None:
                        return None
                    out = []
                    for x, r in zip(bufs, rows):
                        axis = 1 if x.ndim == 3 else 2  # time axis
                        sl = jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=0)
                        sl = jax.lax.dynamic_update_slice_in_dim(
                            sl, r.astype(sl.dtype), 0, axis=axis)
                        out.append(jax.lax.dynamic_update_slice_in_dim(
                            x, sl, slot, axis=0))
                    return tuple(out)

                return kvc.KVCache(
                    upd(cache.k, k), upd(cache.v, v),
                    upd(cache.k_scale, ks), upd(cache.v_scale, vs),
                    cache.length.at[slot].set(set_len),
                )

            self._compiled_install[key] = install
        cache = self.d_cache if draft else self.cache
        cache = install(cache, rows["k"], rows["v"], rows["ks"], rows["vs"],
                        jnp.int32(slot), jnp.int32(set_len))
        if draft:
            self.d_cache = cache
        else:
            self.cache = cache

    # --- speculative mode --------------------------------------------------

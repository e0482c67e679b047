"""Slot attention with per-slot (unshared) parameters.

The reference (``SPConvNets/utils/slot_attention_spec_v2.py``) builds a Python
ModuleList per slot — q/k/v/GRU/MLP/LayerNorm each duplicated per slot and
applied in loops.  Here every per-slot weight carries a leading slot axis and
the whole update is batched einsums — one fused pass instead of S module
calls.  Semantics match: softmax over the SLOT axis, renormalise over points,
per-slot GRU, residual per-slot MLP.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SlotAttention(nn.Module):
    num_slots: int
    dim: int
    iters: int = 3
    hidden_dim: int = 128
    eps: float = 1e-8

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        temp: Optional[jnp.ndarray] = None,
    ):
        """inputs: [B, N, D] -> (slots [B, S, D], attn [B, S, N]).

        ``temp`` (scalar >= 1) divides the slot-softmax logits — the
        annealing lever (config.attn_temp_*) that keeps the attention
        plastic early in training; None/1 is the reference semantics."""
        B, N, D = inputs.shape
        S = self.num_slots
        H = max(self.dim, self.hidden_dim)
        scale = D ** -0.5

        def pp(name, shape, init=nn.initializers.lecun_normal()):
            return self.param(name, init, shape)

        mu = self.param("slots_mu", nn.initializers.normal(1.0), (S, D))
        log_sigma = self.param(
            "slots_logsigma", nn.initializers.xavier_uniform(), (S, D)
        )

        wq = pp("wq", (S, D, D))
        bq = self.param("bq", nn.initializers.zeros, (S, D))
        wk = pp("wk", (S, D, D))
        bk = self.param("bk", nn.initializers.zeros, (S, D))
        wv = pp("wv", (S, D, D))
        bv = self.param("bv", nn.initializers.zeros, (S, D))

        # per-slot GRU (update/reset/new gates)
        w_gru_x = pp("gru_wx", (S, D, 3 * D))
        w_gru_h = pp("gru_wh", (S, D, 3 * D))
        b_gru = self.param("gru_b", nn.initializers.zeros, (S, 3 * D))

        w_m1 = pp("mlp_w1", (S, D, H))
        b_m1 = self.param("mlp_b1", nn.initializers.zeros, (S, H))
        w_m2 = pp("mlp_w2", (S, H, D))
        b_m2 = self.param("mlp_b2", nn.initializers.zeros, (S, D))

        ln_params = {
            name: (
                self.param(name + "_g", nn.initializers.ones, (S, D)),
                self.param(name + "_b", nn.initializers.zeros, (S, D)),
            )
            for name in ("norm_input", "norm_slots", "norm_pre_ff")
        }

        def slot_ln(name, x):  # x: [B, S, ..., D], per-slot scale/bias
            g, b = ln_params[name]
            m = jnp.mean(x, axis=-1, keepdims=True)
            v = jnp.var(x, axis=-1, keepdims=True)
            y = (x - m) * jax.lax.rsqrt(v + 1e-6)
            if x.ndim == 4:  # [B, S, N, D]
                return y * g[None, :, None, :] + b[None, :, None, :]
            return y * g[None] + b[None]

        if rng is None:
            noise = jnp.zeros((B, S, D))
        else:
            noise = jax.random.normal(rng, (B, S, D))
        slots = mu[None] + jnp.exp(log_sigma)[None] * noise  # [B, S, D]

        # normalise inputs per slot, then project to k, v  (per-slot weights)
        x_in = jnp.broadcast_to(inputs[:, None], (B, S, N, D))
        x_in = slot_ln("norm_input", x_in)
        k = jnp.einsum("bsnd,sde->bsne", x_in, wk) + bk[None, :, None, :]
        v = jnp.einsum("bsnd,sde->bsne", x_in, wv) + bv[None, :, None, :]

        attn_vis = jnp.zeros((B, S, N))
        for _ in range(self.iters):
            prev = slots
            q_in = slot_ln("norm_slots", slots)
            q = jnp.einsum("bsd,sde->bse", q_in, wq) + bq[None]
            dots = jnp.einsum("bsd,bsnd->bsn", q, k) * scale
            if temp is not None:
                dots = dots / temp
            attn_ori = jax.nn.softmax(dots, axis=1) + self.eps  # over slots
            attn_vis = attn_ori
            attn = attn_ori / jnp.sum(attn_ori, axis=-1, keepdims=True)
            updates = jnp.einsum("bsnd,bsn->bsd", v, attn)

            # per-slot GRU step
            gx = jnp.einsum("bsd,sde->bse", updates, w_gru_x)
            gh = jnp.einsum("bsd,sde->bse", prev, w_gru_h)
            zr_x, n_x = gx[..., : 2 * D], gx[..., 2 * D :]
            zr_h, n_h = gh[..., : 2 * D], gh[..., 2 * D :]
            b_zr, b_n = b_gru[:, : 2 * D][None], b_gru[:, 2 * D :][None]
            zr = jax.nn.sigmoid(zr_x + zr_h + b_zr)
            z, r = zr[..., :D], zr[..., D:]
            n = jnp.tanh(n_x + r * n_h + b_n)
            slots = (1.0 - z) * n + z * prev

            pre = slot_ln("norm_pre_ff", slots)
            h = jax.nn.relu(jnp.einsum("bsd,sdh->bsh", pre, w_m1) + b_m1[None])
            slots = slots + jnp.einsum("bsh,shd->bsd", h, w_m2) + b_m2[None]

        return slots, attn_vis

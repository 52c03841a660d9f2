"""Hierarchical audio conditioning stack (the reference's core IP), in Flax.

CLAP embedding [B,512] -> 10 semantic tokens soft-assigned to
{foreground, background, ambience} -> routed to UNet early/mid/late levels +
projected to 77 CLIP-shaped tokens.

Behavioral contract follows reference models/hierarchical_audio_v4.py:
- SoftHierarchicalDecomposition (:79-238): shared MLP 512->512->768 with
  per-token offsets; cosine-sim-to-anchors x10 + gating head, temperature
  softmax over 3 levels.
- AdaptiveHierarchyWeights (:241-290): 512->6->3 softmax MLP.
- LevelToUNetRouter (:293-369): weight-modulated assignments x row-softmaxed
  3x3 routing matrix, per-level sigmoid gates.
- CrossHierarchyAttention (:495-591): 768->192 bottlenecked pre-norm block.
- AudioProjectionTransformer77 (:375-492): 77 learned queries cross-attend
  over the 10 tokens in a 256-d bottleneck, 4 blocks.
- compute_losses (:661-711): entropy / orthogonality / KL-to-prior.

TPU-native deltas: temperature is an explicit argument (pure function of
step, see temperature.py) instead of a mutated buffer; everything is
jit-compiled; dropout is keyed explicitly.

Parameter shapes match the reference exactly (decomposer 1,232,843;
adaptive 3,111; router 12; projector 2,604,800 — verified in
tests/test_condition.py), so torch checkpoints convert one-to-one.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import ConditionConfig
from clap2diffusion_tpu.ops.attention import mha

LEVELS = ("early", "mid", "late")


def _normal(std: float):
    return nn.initializers.normal(stddev=std)


class CrossHierarchyAttention(nn.Module):
    """Bottlenecked pre-norm self-attention + MLP over the token sequence.

    (reference models/hierarchical_audio_v4.py:495-591)
    """

    dim: int = 768
    num_heads: int = 4
    bottleneck_dim: int = 192
    mlp_ratio: float = 2.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.bottleneck_dim % self.num_heads != 0:
            raise ValueError("bottleneck_dim must divide num_heads")
        x_orig = x
        x = nn.Dense(self.bottleneck_dim, name="input_proj")(x)

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(self.bottleneck_dim * 3, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = mha(q, k, v, self.num_heads)
        attn = nn.Dense(self.bottleneck_dim, name="proj")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = residual + attn

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hidden = int(self.bottleneck_dim * self.mlp_ratio)
        h = nn.Dense(hidden, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.bottleneck_dim, name="mlp_fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = residual + h

        return x_orig + nn.Dense(self.dim, name="output_proj")(x)


class SoftHierarchicalDecomposition(nn.Module):
    """CLAP [B,512] -> 10 tokens [B,10,768] + soft level assignments [B,10,3].

    (reference models/hierarchical_audio_v4.py:79-238)
    """

    cfg: ConditionConfig

    @nn.compact
    def __call__(
        self,
        audio_features: jax.Array,
        temperature: jax.Array | float = 2.0,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict]:
        c = self.cfg
        # Factorized token generator: shared MLP + per-token offsets (:109-118)
        h = nn.Dense(512, name="mlp_fc1")(audio_features)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        shared = nn.Dense(c.token_dim, name="mlp_fc2")(h)  # [B, D]

        token_offsets = self.param(
            "token_offsets", _normal(0.02), (c.num_tokens, c.token_dim)
        )
        tokens = shared[:, None, :] + token_offsets[None]  # [B, K, D]

        # Soft assignment: cosine sim to anchors x scale + gating bias (:154-182)
        level_anchors = self.param(
            "level_anchors", _normal(0.02), (c.num_levels, c.token_dim)
        )
        t32 = tokens.astype(jnp.float32)
        tokens_n = t32 / (jnp.linalg.norm(t32, axis=-1, keepdims=True) + 1e-12)
        anchors32 = level_anchors.astype(jnp.float32)
        anchors_n = anchors32 / (
            jnp.linalg.norm(anchors32, axis=-1, keepdims=True) + 1e-12
        )
        similarity = jnp.einsum("bkd,ld->bkl", tokens_n, anchors_n)
        similarity = similarity * c.similarity_scale

        g = nn.Dense(10, name="gate_fc1")(tokens)
        g = nn.gelu(g, approximate=False)
        gate_logits = nn.Dense(c.num_levels, name="gate_fc2")(g)

        logits = similarity + gate_logits.astype(jnp.float32)
        temperature = jnp.maximum(jnp.asarray(temperature, jnp.float32), 0.1)
        assignments = jax.nn.softmax(logits / temperature, axis=-1)

        tokens = CrossHierarchyAttention(
            dim=c.token_dim,
            num_heads=c.hierarchy_heads,
            bottleneck_dim=c.hierarchy_bottleneck,
            mlp_ratio=1.5,  # (reference :143)
            name="cross_hierarchy_attn",
        )(tokens, deterministic=deterministic)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)

        info = {
            "assignments": assignments.astype(tokens.dtype),
            "temperature": temperature,
        }
        return tokens, info


class AdaptiveHierarchyWeights(nn.Module):
    """Per-sample softmax weights over the 3 levels (512->6->3 MLP).

    (reference models/hierarchical_audio_v4.py:241-290)
    """

    num_levels: int = 3
    hidden_dim: int = 6

    @nn.compact
    def __call__(self, audio_features: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_dim, name="fc1")(audio_features)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        logits = nn.Dense(self.num_levels, name="fc2")(h)
        return jax.nn.softmax(logits, axis=-1)


class LevelToUNetRouter(nn.Module):
    """Route tokens to UNet early/mid/late scales.

    (reference models/hierarchical_audio_v4.py:293-369). Routing matrix rows
    are softmaxed; init biases foreground->late, background->mid,
    ambience->early (:318-322); per-scale sigmoid gates start at 0.5 (:311-314).
    """

    cfg: ConditionConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        assignments: jax.Array,
        hierarchy_weights: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        routing_init = jnp.array(
            [[0.1, 0.3, 0.6], [0.2, 0.6, 0.2], [0.6, 0.3, 0.1]], jnp.float32
        )
        routing_matrix = self.param(
            "routing_matrix", lambda rng: routing_init
        )
        gates = {
            lvl: self.param(
                f"gate_{lvl}",
                nn.initializers.constant(self.cfg.router_gate_init),
                (1,),
            )
            for lvl in LEVELS
        }

        if hierarchy_weights is not None:
            assignments = assignments * hierarchy_weights[:, None, :]
            assignments = assignments / (
                jnp.sum(assignments, axis=-1, keepdims=True) + 1e-8
            )

        routing = assignments @ jax.nn.softmax(routing_matrix, axis=1)
        routed = {}
        for i, lvl in enumerate(LEVELS):
            gate = jax.nn.sigmoid(gates[lvl]).astype(tokens.dtype)
            routed[lvl] = tokens * routing[:, :, i : i + 1].astype(tokens.dtype) * gate
        return routed


class PerceiverCrossBlock(nn.Module):
    """Pre-norm cross-attention + 2x FFN block in the projector bottleneck.

    (reference models/hierarchical_audio_v4.py:375-414)
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, queries: jax.Array, keys_values: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        qn = nn.LayerNorm(epsilon=1e-5, name="ln_q")(queries)
        kvn = nn.LayerNorm(epsilon=1e-5, name="ln_kv")(keys_values)
        q = nn.Dense(self.d_model, name="q_proj")(qn)
        k = nn.Dense(self.d_model, name="k_proj")(kvn)
        v = nn.Dense(self.d_model, name="v_proj")(kvn)
        attn = mha(q, k, v, self.num_heads)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        queries = queries + attn

        h = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(queries)
        h = nn.Dense(self.d_model * 2, name="ffn_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="ffn_fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return queries + h


class AudioProjectionTransformer77(nn.Module):
    """Perceiver decoder: N audio tokens -> 77 CLIP-compatible tokens.

    (reference models/hierarchical_audio_v4.py:417-492)
    """

    cfg: ConditionConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        b = x.shape[0]
        audio = nn.Dense(c.projector_bottleneck, name="audio_proj")(x)

        queries = self.param(
            "queries", _normal(0.02), (c.num_output_tokens, c.projector_bottleneck)
        )
        query_pos = self.param(
            "query_pos",
            nn.initializers.zeros,
            (c.num_output_tokens, c.projector_bottleneck),
        )
        q = jnp.broadcast_to(
            (queries + query_pos)[None],
            (b, c.num_output_tokens, c.projector_bottleneck),
        ).astype(audio.dtype)

        for i in range(c.projector_layers):
            q = PerceiverCrossBlock(
                d_model=c.projector_bottleneck,
                num_heads=c.projector_heads,
                name=f"block_{i}",
            )(q, audio, deterministic=deterministic)

        out = nn.Dense(c.token_dim, name="out_proj")(q)
        clip_pos = self.param(
            "clip_pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, c.num_output_tokens, c.token_dim),
        )
        out = out + clip_pos.astype(out.dtype)
        return nn.LayerNorm(epsilon=1e-5, name="out_norm")(out)


class HierarchicalAudioEncoder(nn.Module):
    """Top-level V4 encoder: decomposer + adaptive weights + router + projector.

    (reference models/hierarchical_audio_v4.py:594-772,
    ``ImprovedHierarchicalAudioEncoder``)

    ``__call__(audio[B,512], temperature) -> tokens77 [B,77,768]`` or, with
    ``return_all=True``, ``(tokens77, info)`` where info carries tokens_10,
    assignments, routed {early,mid,late}, hierarchy_weights, losses, stats.
    """

    cfg: ConditionConfig
    use_adaptive_weights: bool = True

    @nn.compact
    def __call__(
        self,
        audio_features: jax.Array,
        temperature: jax.Array | float = 2.0,
        *,
        return_all: bool = False,
        deterministic: bool = True,
    ):
        c = self.cfg
        tokens_10, decomp_info = SoftHierarchicalDecomposition(
            cfg=c, name="decomposer"
        )(audio_features, temperature, deterministic=deterministic)
        assignments = decomp_info["assignments"]

        hierarchy_weights = None
        if self.use_adaptive_weights:
            hierarchy_weights = AdaptiveHierarchyWeights(
                num_levels=c.num_levels, name="adaptive_weights"
            )(audio_features)

        routed = LevelToUNetRouter(cfg=c, name="router")(
            tokens_10, assignments, hierarchy_weights
        )
        tokens_77 = AudioProjectionTransformer77(cfg=c, name="projector")(
            tokens_10, deterministic=deterministic
        )

        if not return_all:
            return tokens_77

        losses = compute_condition_losses(
            assignments, tokens_10, jnp.asarray(c.level_prior, jnp.float32)
        )
        info = {
            "tokens_10": tokens_10,
            "tokens_77": tokens_77,
            "assignments": assignments,
            "routed": routed,
            "hierarchy_weights": hierarchy_weights,
            "losses": losses,
            "stats": assignment_stats(assignments),
            "temperature": decomp_info["temperature"],
        }
        return tokens_77, info


def compute_condition_losses(
    assignments: jax.Array, tokens: jax.Array, level_prior: jax.Array
) -> Dict[str, jax.Array]:
    """Stage-2 regularizers (reference models/hierarchical_audio_v4.py:661-711).

    - entropy: mean token-assignment entropy (weighted positively in stage 2,
      matching the reference's sign convention at train_stage2.py:129-131).
    - orthogonality: MSE between the token Gram matrix and identity.
    - prior: KL(empirical level usage || 5-3-2 prior), batch-mean.
    """
    a = assignments.astype(jnp.float32)
    entropy = -jnp.sum(a * jnp.log(a + 1e-8), axis=-1).mean()

    t = tokens.astype(jnp.float32)
    t_n = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    gram = jnp.einsum("bkd,bjd->bkj", t_n, t_n)
    eye = jnp.eye(tokens.shape[1], dtype=jnp.float32)
    ortho = jnp.mean((gram - eye[None]) ** 2)

    avg_assignment = a.mean(axis=1)  # [B, L]
    prior = level_prior[None]
    kl = jnp.sum(
        avg_assignment * (jnp.log(avg_assignment + 1e-8) - jnp.log(prior)), axis=-1
    ).mean()

    return {"entropy": entropy, "orthogonality": ortho, "prior": kl}


def assignment_stats(assignments: jax.Array) -> Dict[str, jax.Array]:
    """Monitoring stats (reference models/hierarchical_audio_v4.py:222-236)."""
    a = assignments.astype(jnp.float32)
    avg = a.mean(axis=(0, 1))
    entropy = -jnp.sum(a * jnp.log(a + 1e-8), axis=-1).mean()
    return {
        "avg_assignment": avg,
        "entropy": entropy,
        "effective_levels": jnp.exp(entropy),
    }


# ---------------------------------------------------------------------------
# Legacy rigid variants (reference backward-compat path, what its scripts and
# gradio app actually import: models/hierarchical_audio_v4.py:776-932)
# ---------------------------------------------------------------------------


class RigidHierarchicalDecomposition(nn.Module):
    """Hard 5/3/2 split via three per-level MLPs + 3 global softmax weights.

    (reference models/hierarchical_audio_v4.py:776-882)
    """

    cfg: ConditionConfig
    num_foreground: int = 5
    num_background: int = 3
    num_ambience: int = 2

    @nn.compact
    def __call__(self, audio_features: jax.Array, *, deterministic: bool = True):
        d = self.cfg.token_dim
        b = audio_features.shape[0]

        def proj(hidden: int, n_tok: int, name: str) -> jax.Array:
            h = nn.Dense(hidden, name=f"{name}_fc1")(audio_features)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(0.1)(h, deterministic=deterministic)
            h = nn.Dense(d * n_tok, name=f"{name}_fc2")(h)
            return h.reshape(b, n_tok, d)

        fg = proj(d * 2, self.num_foreground, "foreground")
        bg = proj(d, self.num_background, "background")
        amb = proj(d // 2, self.num_ambience, "ambience")

        w_param = self.param(
            "hierarchy_weights",
            lambda rng: jnp.array([0.5, 0.3, 0.2], jnp.float32),
        )
        w = jax.nn.softmax(w_param, axis=0).astype(fg.dtype)
        tokens = jnp.concatenate([fg * w[0], bg * w[1], amb * w[2]], axis=1)

        tokens = CrossHierarchyAttention(
            dim=d,
            num_heads=4,
            bottleneck_dim=self.cfg.hierarchy_bottleneck,
            mlp_ratio=2.0,  # legacy keeps the CHA default (reference :834)
            name="cross_hierarchy_attn",
        )(tokens, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(tokens)


class HierarchicalAudioV4(nn.Module):
    """Legacy stage-1 encoder: rigid decomposer + 77-token projector.

    (reference models/hierarchical_audio_v4.py:885-932). The reference's
    ctor crashes when called with ``num_tokens``/``num_levels`` kwargs
    (SURVEY.md 2.10.1) — this rebuild accepts the config object instead.
    """

    cfg: ConditionConfig

    @nn.compact
    def __call__(
        self,
        clap_features: jax.Array,
        *,
        return_intermediate: bool = False,
        deterministic: bool = True,
    ):
        tokens10 = RigidHierarchicalDecomposition(cfg=self.cfg, name="decomposer")(
            clap_features, deterministic=deterministic
        )
        tokens77 = AudioProjectionTransformer77(cfg=self.cfg, name="projector")(
            tokens10, deterministic=deterministic
        )
        if return_intermediate:
            return tokens77, {"tokens10": tokens10}
        return tokens77

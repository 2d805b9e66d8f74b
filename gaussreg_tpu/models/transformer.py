"""Transformer layers: vanilla + geometric-RPE attention, conditional stack.

reference: geotransformer/modules/transformer/vanilla_transformer.py:15-129,
rpe_transformer.py:18-131, conditional_transformer.py:73-117,
positional_embedding.py:8-34, output_layer.py:6-21.

Masks use the *valid* convention (True = keep) throughout, opposite to the
reference's `key_masks` (True = ignored) — inverted at the softmax.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_embedding(indices: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Continuous-index sinusoidal embedding with interleaved [sin, cos]
    pairs (reference positional_embedding.py:18-34: the (d/2, 2) reshape
    interleaves sin and cos)."""
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model)
    )
    omega = indices[..., None] * div  # (..., d/2)
    emb = jnp.stack([jnp.sin(omega), jnp.cos(omega)], axis=-1)  # (..., d/2, 2)
    return emb.reshape(indices.shape + (d_model,))


class AttentionOutput(nn.Module):
    """d -> 2d -> d feed-forward + residual LayerNorm
    (reference output_layer.py:6-21).

    The squeeze projection is ZERO-initialized: each residual branch starts
    as a no-op so the post-LN stack is variance-preserving at init. With the
    default init the attention mean-mixing shrinks token variance ~2x per
    block; after 6 blocks the coarse features collapse to a single vector
    and the circle loss sits at a zero-gradient saddle forever (measured:
    token-std 0.81 -> 0.08 through the stack, then d(feat)=const to 7
    decimals under Adam). Init-only change — imported reference weights
    overwrite it (engine/torch_import.py)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_model * 2)(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.zeros)(h)
        return nn.LayerNorm()(x + h)


class MultiHeadAttention(nn.Module):
    """Vanilla scaled dot-product MHA
    (reference vanilla_transformer.py:15-70)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_valid=None):
        h = self.num_heads
        dh = self.d_model // h
        q = nn.Dense(self.d_model, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, name="proj_v")(v_in)
        q = q.reshape(q.shape[:-1] + (h, dh))
        k = k.reshape(k.shape[:-1] + (h, dh))
        v = v.reshape(v.shape[:-1] + (h, dh))
        scores = jnp.einsum("...nhc,...mhc->...hnm", q, k) / np.sqrt(dh)
        if key_valid is not None:
            scores = jnp.where(key_valid[..., None, None, :], scores, -jnp.inf)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hnm,...mhc->...nhc", attn, v)
        return out.reshape(out.shape[:-2] + (self.d_model,))


class RPEMultiHeadAttention(nn.Module):
    """MHA with pairwise relative positional embeddings added to the logits.

    Mathematically identical to the reference
    (rpe_transformer.py:18-72: einsum('bhnc,bhnmc->bhnm', q, proj_p(embed)))
    but the linear projection is applied to q instead of the embedding:
    <q, Wp e + bp> = <Wp^T q, e> + <q, bp>. This avoids materializing the
    (N, M, d_model) projected-embedding tensor per layer (~400 MB and
    ~54 GFLOP each at production capacity) — the pairwise embedding is only
    ever contracted against, never stored projected."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, embed_qk, key_valid=None):
        h = self.num_heads
        dh = self.d_model // h
        d_embed = embed_qk.shape[-1]
        q = nn.Dense(self.d_model, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, name="proj_v")(v_in)
        wp = self.param(
            "proj_p_kernel", nn.initializers.lecun_normal(), (d_embed, self.d_model)
        )
        bp = self.param("proj_p_bias", nn.initializers.zeros, (self.d_model,))
        q = q.reshape(q.shape[:-1] + (h, dh))
        k = k.reshape(k.shape[:-1] + (h, dh))
        v = v.reshape(v.shape[:-1] + (h, dh))
        scores_e = jnp.einsum("...nhc,...mhc->...hnm", q, k)
        # <q, Wp e>: project q back through Wp, contract with the raw embed
        qp = jnp.einsum("...nhc,Dhc->...nhD", q, wp.reshape(d_embed, h, dh))
        scores_p = jnp.einsum("...nmD,...nhD->...hnm", embed_qk, qp)
        qb = jnp.einsum("...nhc,hc->...nh", q, bp.reshape(h, dh))
        scores_p = scores_p + jnp.swapaxes(qb, -1, -2)[..., None]
        scores = (scores_e + scores_p) / np.sqrt(dh)
        if key_valid is not None:
            scores = jnp.where(key_valid[..., None, None, :], scores, -jnp.inf)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hnm,...mhc->...nhc", attn, v)
        return out.reshape(out.shape[:-2] + (self.d_model,))


class TransformerLayer(nn.Module):
    """attention -> linear -> residual LN -> FFN
    (reference vanilla_transformer.py:73-129)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, memory, key_valid=None):
        h = MultiHeadAttention(self.d_model, self.num_heads)(
            x, memory, memory, key_valid
        )
        # zero-init: residual branch starts as a no-op (see AttentionOutput)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.zeros)(h)
        x = nn.LayerNorm()(x + h)
        return AttentionOutput(self.d_model)(x)


class RPETransformerLayer(nn.Module):
    """reference rpe_transformer.py:75-131."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, memory, embed_qk, key_valid=None):
        h = RPEMultiHeadAttention(self.d_model, self.num_heads)(
            x, memory, memory, embed_qk, key_valid
        )
        # zero-init: residual branch starts as a no-op (see AttentionOutput)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.zeros)(h)
        x = nn.LayerNorm()(x + h)
        return AttentionOutput(self.d_model)(x)


class LearnablePositionalEmbedding(nn.Module):
    """Embedding bank with index clamping + LayerNorm
    (reference positional_embedding.py:37-65)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, indices):
        idx = jnp.minimum(indices, self.num_embeddings - 1)
        emb = nn.Embed(self.num_embeddings, self.embedding_dim)(idx)
        return nn.LayerNorm()(emb)


class PEMultiHeadAttention(nn.Module):
    """Additive positional-embedding attention: q/k are augmented with
    projected per-token position embeddings
    (reference pe_transformer.py:15-72)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, embed_q, embed_k, key_valid=None):
        h = self.num_heads
        dh = self.d_model // h
        q = nn.Dense(self.d_model, name="proj_q")(q_in) + nn.Dense(
            self.d_model, name="proj_p_q"
        )(embed_q)
        k = nn.Dense(self.d_model, name="proj_k")(k_in) + nn.Dense(
            self.d_model, name="proj_p_k"
        )(embed_k)
        v = nn.Dense(self.d_model, name="proj_v")(v_in)
        q = q.reshape(q.shape[:-1] + (h, dh))
        k = k.reshape(k.shape[:-1] + (h, dh))
        v = v.reshape(v.shape[:-1] + (h, dh))
        scores = jnp.einsum("...nhc,...mhc->...hnm", q, k) / np.sqrt(dh)
        if key_valid is not None:
            scores = jnp.where(key_valid[..., None, None, :], scores, -jnp.inf)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hnm,...mhc->...nhc", attn, v)
        return out.reshape(out.shape[:-2] + (self.d_model,))


class LRPEMultiHeadAttention(nn.Module):
    """Learnable relative positional embedding attention: pairwise integer
    relation indices select embeddings from a bank which bias the logits
    (reference lrpe_transformer.py:19-87)."""

    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, relation_indices, key_valid=None):
        h = self.num_heads
        dh = self.d_model // h
        q = nn.Dense(self.d_model, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, name="proj_v")(v_in)
        p = LearnablePositionalEmbedding(self.num_embeddings, self.d_model)(
            relation_indices
        )  # (..., N, M, d)
        q = q.reshape(q.shape[:-1] + (h, dh))
        k = k.reshape(k.shape[:-1] + (h, dh))
        v = v.reshape(v.shape[:-1] + (h, dh))
        p = p.reshape(p.shape[:-1] + (h, dh))
        scores = (
            jnp.einsum("...nhc,...mhc->...hnm", q, k)
            + jnp.einsum("...nhc,...nmhc->...hnm", q, p)
        ) / np.sqrt(dh)
        if key_valid is not None:
            scores = jnp.where(key_valid[..., None, None, :], scores, -jnp.inf)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hnm,...mhc->...nhc", attn, v)
        return out.reshape(out.shape[:-2] + (self.d_model,))


class TransformerEncoder(nn.Module):
    """Self-attention stack (reference vanilla_transformer.py:146-177)."""

    d_model: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, feats, valid=None):
        for i in range(self.num_layers):
            feats = TransformerLayer(
                self.d_model, self.num_heads, name=f"layer_{i}"
            )(feats, feats, valid)
        return feats


class TransformerDecoder(nn.Module):
    """Self + cross attention stack
    (reference vanilla_transformer.py:132-143, 180-201)."""

    d_model: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, q_feats, s_feats, q_valid=None, s_valid=None):
        for i in range(self.num_layers):
            q_feats = TransformerLayer(
                self.d_model, self.num_heads, name=f"self_{i}"
            )(q_feats, q_feats, q_valid)
            q_feats = TransformerLayer(
                self.d_model, self.num_heads, name=f"cross_{i}"
            )(q_feats, s_feats, s_valid)
        return q_feats


class VanillaConditionalTransformer(nn.Module):
    """Alternating self/cross blocks without positional embeddings
    (reference conditional_transformer.py:14-70)."""

    blocks: tuple
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, feats0, feats1, valid0=None, valid1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, name=f"layer_{i}_self"
                )
                feats0 = layer(feats0, feats0, valid0)
                feats1 = layer(feats1, feats1, valid1)
            else:
                layer = TransformerLayer(
                    self.d_model, self.num_heads, name=f"layer_{i}_cross"
                )
                feats0 = layer(feats0, feats1, valid1)
                feats1 = layer(feats1, feats0, valid0)
        return feats0, feats1


class RPEConditionalTransformer(nn.Module):
    """Alternating self (RPE) / cross (vanilla) blocks over the (ref, src)
    feature streams (reference conditional_transformer.py:73-117)."""

    blocks: tuple
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, feats0, feats1, embed0, embed1, valid0=None, valid1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(
                    self.d_model, self.num_heads, name=f"layer_{i}_self"
                )
                feats0 = layer(feats0, feats0, embed0, valid0)
                feats1 = layer(feats1, feats1, embed1, valid1)
            else:
                layer = TransformerLayer(
                    self.d_model, self.num_heads, name=f"layer_{i}_cross"
                )
                feats0 = layer(feats0, feats1, valid1)
                feats1 = layer(feats1, feats0, valid0)
        return feats0, feats1

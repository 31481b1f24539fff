"""AV-HuBERT seq2seq/CTC heads: shapes, losses, torch parity of a decoder
layer, greedy decode sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.models.avhubert_s2s import (
    S2SDecoderConfig,
    ctc_loss,
    init_ctc_head,
    init_s2s_decoder,
    s2s_cross_entropy,
    s2s_decoder_forward,
    s2s_greedy_decode,
    sinusoidal_embedding,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def tiny_cfg():
    return S2SDecoderConfig(
        vocab_size=50, embed_dim=32, ffn_dim=64, layers=2, heads=4,
        encoder_dim=48, max_target_positions=64,
    )


def test_forward_and_ce():
    cfg = tiny_cfg()
    params = init_s2s_decoder(jax.random.PRNGKey(0), cfg)
    B, T, S = 2, 7, 11
    prev = jnp.asarray(np.random.RandomState(0).randint(3, 50, (B, T)), jnp.int32)
    enc = jnp.asarray(np.random.RandomState(1).randn(B, S, 48).astype(np.float32))
    logits = s2s_decoder_forward(params, cfg, prev, enc, jnp.array([S, 6]))
    assert logits.shape == (B, T, 50)
    tgt = jnp.asarray(np.random.RandomState(2).randint(3, 50, (B, T)), jnp.int32)
    loss = s2s_cross_entropy(logits, tgt, cfg.pad_id)
    assert jnp.isfinite(loss)


def test_ctc():
    rng = jax.random.PRNGKey(0)
    head = init_ctc_head(rng, 48, 30)
    enc = jnp.asarray(np.random.RandomState(3).randn(2, 20, 48).astype(np.float32))
    targets = jnp.asarray(np.random.RandomState(4).randint(1, 30, (2, 5)), jnp.int32)
    loss = ctc_loss(head, enc, jnp.array([20, 15]), targets, jnp.array([5, 3]))
    assert jnp.isfinite(loss) and float(loss) > 0


def test_greedy_decode_shapes():
    cfg = tiny_cfg()
    params = init_s2s_decoder(jax.random.PRNGKey(1), cfg)
    enc = jnp.asarray(np.random.RandomState(5).randn(2, 9, 48).astype(np.float32))
    out = s2s_greedy_decode(params, cfg, enc, jnp.array([9, 9]), max_new=6)
    assert out.shape == (2, 6)


def test_cached_greedy_matches_full_forward():
    """KV-cached incremental decode == repeated full-decoder argmax."""
    cfg = tiny_cfg()
    params = init_s2s_decoder(jax.random.PRNGKey(2), cfg)
    enc = jnp.asarray(np.random.RandomState(6).randn(1, 7, 48).astype(np.float32))
    lens = jnp.array([7])
    max_new = 5
    cached = np.asarray(s2s_greedy_decode(params, cfg, enc, lens, max_new))[0]

    # reference: re-run the full decoder each step (teacher-forcing style)
    tokens = [cfg.eos_id]
    out = []
    for t in range(max_new):
        prev = jnp.asarray([tokens], jnp.int32)
        logits = s2s_decoder_forward(params, cfg, prev, enc, lens)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        if nxt == cfg.eos_id:
            break
        tokens.append(nxt)
    expect = out + [cfg.pad_id] * (max_new - len(out))
    assert cached.tolist() == expect


def test_sinusoidal_matches_fairseq_formula():
    """Check the exact fairseq construction: [sin | cos] with exp spacing."""
    emb = sinusoidal_embedding(10, 8, padding_idx=1)
    half = 4
    scale = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    np.testing.assert_allclose(emb[3, :half], np.sin(3 * scale), atol=1e-6)
    np.testing.assert_allclose(emb[3, half:], np.cos(3 * scale), atol=1e-6)
    assert (emb[1] == 0).all()  # padding_idx row zeroed


class TorchPostLNDecoderLayer(nn.Module):
    """fairseq TransformerDecoderLayer (normalize_before=False) mirror."""

    def __init__(self, D=32, H=4, ffn=64, De=48):
        super().__init__()
        self.H = H
        self.sq = nn.Linear(D, D); self.sk = nn.Linear(D, D)
        self.sv = nn.Linear(D, D); self.so = nn.Linear(D, D)
        self.sn = nn.LayerNorm(D)
        self.cq = nn.Linear(D, D); self.ck = nn.Linear(De, D)
        self.cv = nn.Linear(De, D); self.co = nn.Linear(D, D)
        self.cn = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, ffn); self.fc2 = nn.Linear(ffn, D)
        self.fn = nn.LayerNorm(D)

    def _attn(self, q, k, v, causal):
        B, T, D = q.shape
        S = k.shape[1]
        hd = D // self.H
        q = q.view(B, T, self.H, hd).transpose(1, 2) * hd ** -0.5
        k = k.view(B, S, self.H, hd).transpose(1, 2)
        v = v.view(B, S, self.H, hd).transpose(1, 2)
        s = q @ k.transpose(-1, -2)
        if causal:
            mask = torch.triu(torch.ones(T, S, dtype=torch.bool), 1)
            s = s.masked_fill(mask, float("-inf"))
        return (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(B, T, D)

    def forward(self, x, enc):
        x = x + self.so(self._attn(self.sq(x), self.sk(x), self.sv(x), True))
        x = self.sn(x)
        x = x + self.co(self._attn(self.cq(x), self.ck(enc), self.cv(enc), False))
        x = self.cn(x)
        x = x + self.fc2(torch.relu(self.fc1(x)))
        return self.fn(x)


def test_decoder_layer_torch_parity():
    torch.manual_seed(0)
    tl = TorchPostLNDecoderLayer().eval()
    sd = tl.state_dict()

    def lin(p):
        return {"w": jnp.asarray(sd[f"{p}.weight"].numpy().T),
                "b": jnp.asarray(sd[f"{p}.bias"].numpy())}

    def ln(p):
        return {"scale": jnp.asarray(sd[f"{p}.weight"].numpy()),
                "bias": jnp.asarray(sd[f"{p}.bias"].numpy())}

    layer = {
        "self_attn": {"q": lin("sq"), "k": lin("sk"), "v": lin("sv"), "o": lin("so")},
        "self_norm": ln("sn"),
        "cross_attn": {"q": lin("cq"), "k": lin("ck"), "v": lin("cv"), "o": lin("co")},
        "cross_norm": ln("cn"),
        "fc1": lin("fc1"), "fc2": lin("fc2"), "final_norm": ln("fn"),
    }
    from omni_avsr_tpu.models.avhubert_s2s import _decoder_layer
    from omni_avsr_tpu.ops.attention import causal_mask

    cfg = tiny_cfg()
    rng = np.random.RandomState(6)
    x = rng.randn(2, 5, 32).astype(np.float32)
    enc = rng.randn(2, 9, 48).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x), torch.from_numpy(enc)).numpy()
    ours = _decoder_layer(
        layer, cfg, jnp.asarray(x), jnp.asarray(enc),
        jnp.broadcast_to(causal_mask(5, 5), (2, 1, 5, 5)), None,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_s2s_beam_decode():
    """Beam-1 equals greedy; beam-3 returns a hypothesis with score >= beam-1."""
    from omni_avsr_tpu.models.avhubert_s2s import s2s_beam_decode

    cfg = tiny_cfg()
    params = init_s2s_decoder(jax.random.PRNGKey(3), cfg)
    enc = jnp.asarray(np.random.RandomState(7).randn(2, 9, 48).astype(np.float32))
    lens = jnp.array([9, 6])
    greedy = np.asarray(s2s_greedy_decode(params, cfg, enc, lens, max_new=6))
    beam1 = np.asarray(s2s_beam_decode(params, cfg, enc, lens, max_new=6, num_beams=1))
    # beam-1 with no finished hyps picks the same greedy path when no EOS
    # appears; rows that ended in EOS may differ in padding only
    for g, b in zip(greedy, beam1):
        g = [t for t in g.tolist() if t != cfg.pad_id and t != cfg.eos_id]
        b = [t for t in b.tolist() if t != cfg.pad_id and t != cfg.eos_id]
        assert b == g, (b, g)
    beam3 = np.asarray(s2s_beam_decode(params, cfg, enc, lens, max_new=6, num_beams=3))
    assert beam3.shape == (2, 6)


def test_shared_cross_beam_step_matches_replicated():
    """beams=K with ONE shared cross-K/V copy per sample must produce the
    exact logits of the replicated-cross path (beams=1 on a B*K batch)."""
    from omni_avsr_tpu.models.avhubert_s2s import (
        _s2s_decode_step,
        s2s_precompute_cross,
    )
    from omni_avsr_tpu.ops.attention import padding_mask_from_lengths

    cfg = tiny_cfg()
    params = init_s2s_decoder(jax.random.PRNGKey(2), cfg)
    B, K, S, N = 2, 3, 9, 8
    H, hd = cfg.heads, cfg.embed_dim // cfg.heads
    enc = jnp.asarray(np.random.RandomState(7).randn(B, S, 48).astype(np.float32))
    lens = jnp.array([9, 5])
    ck, cv = s2s_precompute_cross(params, cfg, enc)
    cm = padding_mask_from_lengths(lens, S)[:, None, None, :]
    rs = np.random.RandomState(8)
    tok = jnp.asarray(rs.randint(3, 50, (B * K,)), jnp.int32)
    sk = jnp.asarray(rs.randn(cfg.layers, B * K, N, H, hd).astype(np.float32))
    sv = jnp.asarray(rs.randn(cfg.layers, B * K, N, H, hd).astype(np.float32))
    t = jnp.int32(2)

    shared_logits, shared_sk, shared_sv = _s2s_decode_step(
        params, cfg, tok, t, sk, sv, ck, cv, cm, beams=K
    )
    rep_logits, rep_sk, rep_sv = _s2s_decode_step(
        params, cfg, tok, t, sk, sv,
        jnp.repeat(ck, K, axis=1), jnp.repeat(cv, K, axis=1),
        jnp.repeat(cm, K, axis=0),
    )
    np.testing.assert_allclose(np.asarray(shared_logits), np.asarray(rep_logits),
                               rtol=1e-5, atol=1e-5)
    # later layers' K/V derive from earlier cross outputs, which differ by
    # float reassociation between the folded and replicated einsum layouts
    np.testing.assert_allclose(np.asarray(shared_sk), np.asarray(rep_sk),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(shared_sv), np.asarray(rep_sv),
                               rtol=1e-5, atol=1e-5)

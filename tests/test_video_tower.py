"""Video tower parity vs hand-assembled torch modules (the fairseq/avhubert
math re-built from torch.nn primitives at identical weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_avsr_tpu.config import AVHubertConfig
from omni_avsr_tpu.convert.avhubert_torch import convert_avhubert, fold_weight_norm_conv1d
from omni_avsr_tpu.models.avhubert import avhubert_encode, init_avhubert
from omni_avsr_tpu.models.resnet3d import init_resnet3d, resnet3d_forward

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _torch_basic_block(cin, cout, stride):
    """BasicBlock per `av_hubert/avhubert/resnet.py:35-74` (prelu)."""

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu1 = nn.PReLU(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.relu2 = nn.PReLU(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            h = self.relu1(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return self.relu2(h + r)

    return Block()


class TorchResEncoder(nn.Module):
    """`ResEncoder` per `resnet.py:135-169`."""

    def __init__(self):
        super().__init__()
        self.frontend3D = nn.Sequential(
            nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            nn.BatchNorm3d(64),
            nn.PReLU(64),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        self.trunk = nn.Module()
        for li, (cin, cout, stride) in enumerate(
            [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)], start=1
        ):
            setattr(
                self.trunk, f"layer{li}",
                nn.Sequential(_torch_basic_block(cin, cout, stride),
                              _torch_basic_block(cout, cout, 1)),
            )

    def forward(self, x):  # (B, 1, T, H, W)
        B = x.shape[0]
        x = self.frontend3D(x)
        Tn = x.shape[2]
        x = x.transpose(1, 2).reshape(B * Tn, 64, x.shape[3], x.shape[4])
        for li in range(1, 5):
            x = getattr(self.trunk, f"layer{li}")(x)
        x = x.mean(dim=(2, 3))
        return x.reshape(B, Tn, 512)


def _randomize_bn_stats(mod, rng):
    for m in mod.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
            m.weight.data.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.2 + 1))
            m.bias.data.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))


def test_resnet3d_parity():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    enc = TorchResEncoder().eval()
    with torch.no_grad():
        _randomize_bn_stats(enc, rng)

    # build fairseq-style state dict for the converter
    sd = {f"feature_extractor_video.resnet.{k}": v for k, v in enc.state_dict().items()}
    # converter expects trunk layers under `trunk.layerN.{0,1}`
    from omni_avsr_tpu.convert.avhubert_torch import _resnet

    params = jax.tree_util.tree_map(
        jnp.asarray, _resnet(sd, "feature_extractor_video.resnet")
    )

    video = rng.randn(2, 1, 9, 88, 88).astype(np.float32)  # (B,C,T,H,W)
    with torch.no_grad():
        ref = enc(torch.from_numpy(video)).numpy()
    ours = np.asarray(
        resnet3d_forward(params, jnp.asarray(video.transpose(0, 2, 3, 4, 1)))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_pos_conv_weight_norm_fold():
    torch.manual_seed(1)
    D, K, G = 64, 16, 4
    conv = nn.Conv1d(D, D, K, padding=K // 2, groups=G)
    conv = nn.utils.weight_norm(conv, name="weight", dim=2)
    sp_trim = 1  # even kernel -> SamePad removes last
    x = torch.randn(2, D, 20)
    with torch.no_grad():
        ref = torch.nn.functional.gelu(conv(x)[:, :, :-sp_trim]).numpy()

    g = conv.weight_g.detach().numpy()
    v = conv.weight_v.detach().numpy()
    w = fold_weight_norm_conv1d(g, v)  # (O, I/g, K)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(w.transpose(2, 1, 0)),
        window_strides=(1,), padding=((K // 2, K // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G,
    ) + jnp.asarray(conv.bias.detach().numpy())
    y = jax.nn.gelu(y[:, :-1], approximate=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


class TorchAVHubertLayer(nn.Module):
    """Pre-LN encoder layer with LoRA on q/v, per the patched fairseq
    (`wav2vec2.py:981-1023`, `multihead_attention.py:484-511`)."""

    def __init__(self, D=64, H=4, ffn=128, r=8, scaling_lora=2.0):
        super().__init__()
        self.D, self.H, self.scaling_lora = D, H, scaling_lora
        self.ln1 = nn.LayerNorm(D)
        self.q_proj = nn.Linear(D, D)
        self.k_proj = nn.Linear(D, D)
        self.v_proj = nn.Linear(D, D)
        self.out_proj = nn.Linear(D, D)
        self.lora_down_Q = nn.Linear(D, r, bias=False)
        self.lora_up_Q = nn.Linear(r, D, bias=False)
        self.lora_down_V = nn.Linear(D, r, bias=False)
        self.lora_up_V = nn.Linear(r, D, bias=False)
        self.ln2 = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, ffn)
        self.fc2 = nn.Linear(ffn, D)

    def forward(self, x):  # (B, T, D)
        B, T, D = x.shape
        hd = D // self.H
        h = self.ln1(x)
        q = self.q_proj(h) + self.lora_up_Q(self.lora_down_Q(h)) * self.scaling_lora
        v = self.v_proj(h) + self.lora_up_V(self.lora_down_V(h)) * self.scaling_lora
        k = self.k_proj(h)
        q = q.view(B, T, self.H, hd).transpose(1, 2) * hd ** -0.5
        k = k.view(B, T, self.H, hd).transpose(1, 2)
        v = v.view(B, T, self.H, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        x = x + self.out_proj(attn.transpose(1, 2).reshape(B, T, D))
        h = self.ln2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


def test_avhubert_layer_parity():
    torch.manual_seed(2)
    tl = TorchAVHubertLayer().eval()
    with torch.no_grad():
        for p in (tl.lora_down_Q, tl.lora_down_V):
            p.weight.normal_(0, 0.05)  # non-zero so LoRA actually contributes

    from omni_avsr_tpu.models.avhubert import _encoder_layer

    cfg = AVHubertConfig(
        encoder_embed_dim=64, encoder_layers=1, encoder_heads=4,
        encoder_ffn_dim=128, lora_rank_divisor=8, lora_scaling=2.0,
    )
    sd = tl.state_dict()

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(sd[f"{prefix}.weight"].numpy().T)}
        if bias:
            p["b"] = jnp.asarray(sd[f"{prefix}.bias"].numpy())
        return p

    layer = {
        "attn_norm": {"scale": jnp.asarray(sd["ln1.weight"].numpy()),
                      "bias": jnp.asarray(sd["ln1.bias"].numpy())},
        "attn": {"q": lin("q_proj"), "k": lin("k_proj"), "v": lin("v_proj"),
                 "o": lin("out_proj")},
        "lora": {"down_q": lin("lora_down_Q", False), "up_q": lin("lora_up_Q", False),
                 "down_v": lin("lora_down_V", False), "up_v": lin("lora_up_V", False)},
        "final_norm": {"scale": jnp.asarray(sd["ln2.weight"].numpy()),
                       "bias": jnp.asarray(sd["ln2.bias"].numpy())},
        "fc1": lin("fc1"), "fc2": lin("fc2"),
    }
    x = np.random.RandomState(3).randn(2, 10, 64).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x)).numpy()
    ours = np.asarray(_encoder_layer(layer, cfg, jnp.asarray(x), None))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_avhubert_full_encode_shapes():
    cfg = AVHubertConfig(
        encoder_embed_dim=64, encoder_layers=2, encoder_heads=4,
        encoder_ffn_dim=128, audio_feat_dim=26, lora_rank_divisor=16,
    )
    params = init_avhubert(jax.random.PRNGKey(0), cfg)
    video = jnp.zeros((1, 8, 88, 88, 1), jnp.float32)
    out = avhubert_encode(params, cfg, video)
    assert out.shape == (1, 8, 64)
    # audio-only path (zero-fill video half)
    audio = jnp.zeros((1, 8, 26), jnp.float32)
    out_a = avhubert_encode(params, cfg, None, audio=audio)
    assert out_a.shape == (1, 8, 64)


def test_avhubert_dropout_stochastic_and_eval_deterministic():
    cfg = AVHubertConfig(
        encoder_embed_dim=64, encoder_layers=2, encoder_heads=4,
        encoder_ffn_dim=128, audio_feat_dim=26, lora_rank_divisor=16,
        dropout=0.3, attention_dropout=0.3, dropout_input=0.3, layerdrop=0.5,
    )
    params = init_avhubert(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(np.random.RandomState(1).randn(1, 6, 88, 88, 1).astype(np.float32))
    # eval: deterministic
    a = avhubert_encode(params, cfg, video)
    b = avhubert_encode(params, cfg, video)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train-mode rng: stochastic across keys
    c = avhubert_encode(params, cfg, video, rng=jax.random.PRNGKey(1))
    d = avhubert_encode(params, cfg, video, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(c), np.asarray(d))

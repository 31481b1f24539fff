"""Diagnostic: are per-word signatures visible in the ENCODED features?

Encodes the code corpus with the probe model at INIT (random towers) and
measures leave-one-out nearest-centroid accuracy of the per-position binary
word choice from the pooled post-projector tokens. If accuracy >> 0.5 the
feature->word mapping is linearly accessible and the probe's failure is
optimization; if ~0.5 the signatures don't survive the towers/pipeline.
"""
import os, sys, tempfile
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "benchmarks")

from wer_probe import build_probe_model
from omni_avsr_tpu.config import DataConfig, TrainConfig
from omni_avsr_tpu.data.datamodule import DataModule
from omni_avsr_tpu.data.synthetic import generate_corpus
from omni_avsr_tpu.train.engine import OmniEngine

exp = tempfile.mkdtemp(prefix="diag_feat_")
dd = os.path.join(exp, "d"); os.makedirs(dd, exist_ok=True)
N = 16
tr, va, te = generate_corpus(dd, n_train=N, n_val=1, n_test=1,
                             min_words=8, max_words=8, seed=0,
                             compositional=True)

model = build_probe_model(llm_layers=2)
params = model.init_params(jax.random.PRNGKey(0))
engine = OmniEngine(model, params, TrainConfig(), 1.0, seed=0,
                    inference_only=True, augment=False)

cfgd = DataConfig(root_dir=dd, train_file=tr, val_file=va, test_file=tr,
                  max_frames_audiovisual=200, train_num_buckets=2,
                  num_workers=0)
dm = DataModule(cfgd, model.tok, modality="audiovisual")

# collect per-clip encoded tokens + the gold word-ids
feats_a, feats_v, words = [], [], []
for batch in dm.test_batches(8):
    proc = engine._preprocess(
        {k: jax.numpy.asarray(v) for k, v in batch.items()
         if k not in ("gold_text", "audio_trim_len")},
        jax.random.PRNGKey(0), train=False)
    trim = int(batch.get("audio_trim_len", 100))
    ta = model.encode_audio(params, proc["audio"], proc["audio_len"], 4, trim)
    tv = model.encode_video(params, proc["video"], 2)
    feats_a.append(np.asarray(ta, np.float32))
    feats_v.append(np.asarray(tv, np.float32))
    words += [g.split() for g in batch["gold_text"]]
fa = np.concatenate(feats_a)  # (N, Ta, D)
fv = np.concatenate(feats_v)  # (N, Tv, D)
print("audio tokens", fa.shape, "video tokens", fv.shape, flush=True)

from omni_avsr_tpu.data.synthetic import WORDS, FRAMES_PER_WORD

def loo_acc(F, tokens_per_word):
    """Per-position leave-one-out nearest-centroid accuracy."""
    accs = []
    for p in range(8):
        lo = p * tokens_per_word
        X = F[:, lo:lo + tokens_per_word].reshape(len(F), -1)
        y = np.array([WORDS.index(w[p]) % 2 for w in [words[i] for i in range(len(F))]])
        if len(set(y)) < 2:
            continue
        correct = 0
        for i in range(len(F)):
            m = np.ones(len(F), bool); m[i] = False
            c0 = X[m & (y == 0)].mean(0); c1 = X[m & (y == 1)].mean(0)
            pred = int(np.linalg.norm(X[i] - c1) < np.linalg.norm(X[i] - c0))
            correct += int(pred == y[i])
        accs.append(correct / len(F))
    return accs

# audio: rate 4 -> 50/4=12.5 tok/s, 0.24 s/word = 3 tokens/word
# video: rate 2 -> 12.5 tok/s -> 3 tokens/word
print("audio LOO acc/pos:", [f"{a:.2f}" for a in loo_acc(fa, 3)], flush=True)
print("video LOO acc/pos:", [f"{a:.2f}" for a in loo_acc(fv, 3)], flush=True)

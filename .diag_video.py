"""Diagnostic: can the VIDEO task fit the compositional corpus at all?

Trains the 3-task probe engine on a tiny corpus and prints PER-TASK CE
(engine.eval_step returns the per-task loss dict) every few epochs, CPU-only
so it can run alongside the on-chip probe.
"""
import os, sys, tempfile
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "benchmarks")

from wer_probe import build_probe_model
from omni_avsr_tpu.config import DataConfig, TrainConfig
from omni_avsr_tpu.data.datamodule import DataModule
from omni_avsr_tpu.data.synthetic import generate_corpus
from omni_avsr_tpu.train.engine import OmniEngine

exp = tempfile.mkdtemp(prefix="diag_video_")
data_dir = os.path.join(exp, "d"); os.makedirs(data_dir, exist_ok=True)
n_clips = 8
train_csv, val_csv, test_csv = generate_corpus(
    data_dir, n_train=n_clips, n_val=1, n_test=1,
    min_words=8, max_words=8, seed=0, compositional=True)

model = build_probe_model(llm_layers=2)
params = model.init_params(jax.random.PRNGKey(0))
steps = max(n_clips // 8, 1)
epochs = 400
engine = OmniEngine(model, params,
                    TrainConfig(lr=6e-3, max_epochs=epochs, weight_decay=0.0,
                                warmup_epochs=max(epochs // 20, 1)),
                    float(steps), seed=0,
                    unfrozen_modules=("peft_llm", "lora_avhubert",
                                      "full_llm", "full_towers"),
                    augment=False)
cfgd = DataConfig(root_dir=data_dir, train_file=train_csv, val_file=val_csv,
                  test_file=test_csv, max_frames_audiovisual=200,
                  train_num_buckets=2, num_workers=0)
dm = DataModule(cfgd, model.tok, modality="audiovisual")
for ep in range(epochs):
    for batch in dm.train_batches(ep):
        loss = float(engine.train_step(batch))
    if (ep + 1) % 10 == 0:
        for b in dm.train_batches(0):
            tot, per = engine.eval_step(dict(b))
            print(f"ep {ep+1}: total={float(tot):.3f} "
                  + " ".join(f"{k}={float(v):.3f}" for k, v in per.items()),
                  flush=True)
            break

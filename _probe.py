import os, sys, time
import numpy as np, jax, jax.numpy as jnp, optax
if len(sys.argv) > 1 and sys.argv[1] == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")
from murcl_tpu.engine import BankArrays, ContrastiveEngine, PretrainConfig
from murcl_tpu.models import FullLayer, build_aggregator
from bench import _synthetic_bank, BATCH, FEAT_SIZE, DIM, K, T, NUM_SLIDES

dropout = float(os.environ.get("PROBE_DROPOUT", "0.25"))
bank = _synthetic_bank().device(dtype=jnp.bfloat16)
model, fn_ = build_aggregator("CLAM_SB", dim_in=DIM, num_classes=128,
    arch_setting={"gate": True, "dropout": dropout, "k_sample": 8, "subtyping": True})
fc = FullLayer(feature_num=fn_, hidden_state_dim=1024, class_num=128)
cfg = PretrainConfig(arch="CLAM_SB", T=T, feat_size=FEAT_SIZE, num_clusters=K,
    max_patches=bank.max_patches, train_stage=1, temperature=0.5, alpha=0.9,
    batch_size=BATCH, compute_dtype="bfloat16")
engine = ContrastiveEngine(cfg, model, fc, tx=optax.adam(1e-4))
params = engine.init_params(jax.random.PRNGKey(0), jnp.zeros((BATCH, FEAT_SIZE, DIM), jnp.float32))
agg = engine.init_state(params)
ba = BankArrays.from_bank(bank)
rng_np = np.random.default_rng(1)
def step(agg, seed):
    ids = jnp.asarray(rng_np.integers(0, NUM_SLIDES, BATCH), jnp.int32)
    return engine.train_step(agg, None, ba, ids, jax.random.PRNGKey(seed))
agg, _, st = step(agg, 0); print("warm", float(st.loss))
t0 = time.perf_counter()
for i in range(6):
    agg, _, st = step(agg, i+1)
print("loss", float(st.loss))
print(f"dropout={dropout} prng={jax.config.jax_default_prng_impl}: {(time.perf_counter()-t0)/6*1000:.0f} ms/step")

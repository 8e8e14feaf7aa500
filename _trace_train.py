import numpy as np, jax, jax.numpy as jnp, glob, gzip, json
from collections import defaultdict
from excel_tpu.config import fast, voc_config
from excel_tpu.engine.train import compiled_train_step, init_train_state
from excel_tpu.models.excel import init_excel_params
from excel_tpu.models.params import init_clip_params

cfg = fast(voc_config())
key = jax.random.PRNGKey(0)
clip_params = init_clip_params(key, cfg.clip)
params = init_excel_params(key, cfg, clip_params)
rng = np.random.default_rng(0)
ta = jax.random.normal(key, (45, 512))
ta = ta / jnp.linalg.norm(ta, axis=-1, keepdims=True)
bs = 32
img = jnp.asarray(rng.integers(0, 256, (bs, 320, 320, 3), dtype=np.uint8))
c = jnp.asarray((np.arange(20) < 3).astype(np.float32)[None].repeat(bs, 0))
state = init_train_state(params["head"], cfg.train)
step = compiled_train_step(cfg, calibrated=True, seg_affinity=True,
                           donate=True, class_slots=4)
state, m = step(state, clip_params, img, c, ta, key)
float(m["seg_loss"])
jax.profiler.start_trace("/tmp/jtr3")
for _ in range(3):
    state, m = step(state, clip_params, img, c, ta, key)
float(m["seg_loss"])
jax.profiler.stop_trace()
agg = defaultdict(float)
for p in glob.glob("/tmp/jtr3/**/*.trace.json.gz", recursive=True):
    with gzip.open(p, "rt") as fh:
        data = json.load(fh)
    pids = {p_["pid"]: p_.get("args", {}).get("name", "")
            for p_ in data.get("traceEvents", []) if p_.get("ph") == "M"
            and p_.get("name") == "process_name"}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            if "TPU" in pids.get(e.get("pid"), ""):
                agg[e["name"]] += e["dur"]
top = sorted(agg.items(), key=lambda kv: -kv[1])[:15]
for name, dur in top:
    print(f"{dur/3e3:8.3f} ms  {name[:90]}")

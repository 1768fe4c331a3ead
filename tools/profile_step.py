import sys, glob, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
cfg, mpa_t, sc_t = bench._build("commonroad", 20, 4.0, 256)
from pdmpc_tpu.controller import initial_state, make_prioritized_step
step = jax.jit(lambda st, kk, m, sc: make_prioritized_step(cfg, m, sc)(st, kk))
st = initial_state(sc_t, cfg.Hp)
st2, _ = step(st, jnp.asarray(0, dtype=jnp.int32), mpa_t, sc_t)
float(jnp.sum(st2.pose))
jax.profiler.start_trace("/tmp/jaxtrace")
for k in range(3):
    st, _ = step(st, jnp.asarray(k, dtype=jnp.int32), mpa_t, sc_t)
float(jnp.sum(st.pose))
jax.profiler.stop_trace()
print("trace done:", glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True))

import jax, jax.numpy as jnp
import blackjax_tpu
from blackjax_tpu.mcmc.nuts import build_fused_many_steps

DIM, C, S = 100, 4096, 64
def ld(x):
    lt = x[..., 0]; th = x[..., 1:]
    return -0.5*lt**2 - 0.5*jnp.sum(th**2, -1)*jnp.exp(-lt) - 0.5*(DIM-1)*lt

algo = blackjax_tpu.nuts(ld, step_size=0.22663, inverse_mass_matrix=jnp.ones(DIM), max_num_doublings=8)
keys = jax.random.split(jax.random.key(0), C)
pos = 0.5*jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(keys)
states = jax.vmap(algo.init)(pos)
step_keys = jax.random.split(jax.random.key(1), S)
rng_keys = jax.vmap(lambda k: jax.random.split(k, C))(step_keys)
run = jax.jit(build_fused_many_steps(ld, 0.22663, jnp.ones(DIM), num_steps=S, max_num_doublings=8, track_fn=lambda s: s.position[:8]))
lowered = run.lower(rng_keys, states)
compiled = lowered.compile()
txt = compiled.as_text()
open("/tmp/fused.hlo", "w").write(txt)
print("dumped", len(txt))

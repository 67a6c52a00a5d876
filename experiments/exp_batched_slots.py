"""Sequential-chain timing of the batched-slot ReSTIR pass (honest
measurement: state feeds the next step, no execution overlap)."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.render.renderer import Renderer
from raytracer0_tpu.utils.profiling import sync

H = W = 512
ITERS = 20
scene, cam, cfg = restir_demo()
r = Renderer(scene, cam, cfg, H, W)
t0 = time.perf_counter(); sync(r.step()); comp = time.perf_counter() - t0
sync(r.step())
t0 = time.perf_counter()
for _ in range(ITERS):
    r.step()
sync(r.state)
print(f"restir pass (batched slots) {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

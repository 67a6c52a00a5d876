"""Scene presets — the reference's 9 scenes + the built-in default Cornell.

Each preset returns `(scene, camera, config)` reproducing the scene
geometry, camera, and feature flags of the reference's `scene_select`
(index.html:752-1165) and the default viewport scene (index.js:54-95).
Feature toggles the reference leaves to UI checkboxes (e.g. MIS) can be
overridden via `**cfg_kw`.
"""

from __future__ import annotations

import math

from raytracer0_tpu.config import ANIMATED_CONFIG, OFFLINE_CONFIG, RenderConfig
from raytracer0_tpu.models.camera import Camera
from raytracer0_tpu.models.dsl import parse_scene
from raytracer0_tpu.models.materials import SdfShape


def _cfg(base: RenderConfig = OFFLINE_CONFIG, **kw) -> RenderConfig:
    return base.replace(**kw)


def cornell_default(**cfg_kw):
    """The viewport's built-in Cornell box (index.js:54-95): 5 planes,
    sphere light, two boxes; procedural-sky define on but fully enclosed."""
    scene = parse_scene("""
        MAT_CORNELL_WHITE, PLANE,  vec3( 0.0, 1.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE, PLANE,  vec3( 0.0,-1.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE, PLANE,  vec3( 0.0, 0.0, 1.0), vec4(2.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_RED,   PLANE,  vec3( 1.0, 0.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_GREEN, PLANE,  vec3(-1.0, 0.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_LIGHT_4,       SPHERE, vec3( 0.0, 1.4,-1.2), vec4(0.3, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE, BOX,    vec3( 0.5,-1.0,-1.8), vec4(1.0, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE, BOX,    vec3(-0.45,-1.15,-1.3), vec4(0.7, 0.0, 0.0, 0.0)
    """)
    camera = Camera.make(origin=(0.0, 0.0, 2.8), lookat=(0.0, 0.0, -1.0),
                         fov=50.0, aperture=0.0, focal_length=3.5)
    return scene, camera, _cfg(**cfg_kw)


def default_scene(**cfg_kw):
    """Preset 0 (index.html:752-789): two SDF boxes under the cubemap sky."""
    scene = parse_scene("""
        MAT_METAL, SDF, vec3(0.0, -0.49, 0.0), vec4(1.0)
        MAT_WHITE, SDF, vec3(0.0, -1.6, -0.2), vec4(1.5, 0.1, 1.5, 0.0)
    """, sdf_shapes=[SdfShape.BOX, SdfShape.BOX])
    camera = Camera.make(origin=(0.0, 0.0, 4.0),
                         lookat=(0.0, -math.pi / 18.0, -1.0), fov=45.0)
    cfg = _cfg(use_cubemap=True, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def cornell_box(**cfg_kw):
    """Preset 1 (index.html:789-820): closed Cornell box with a textured
    sphere light and an orange glass sphere."""
    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4_TEX, SPHERE, vec3(0.0, 1.5, -1.5), vec4(0.5)
        MAT_REFR_CLEAR, SPHERE, vec3(0.0), vec4(0.5)
    """)
    camera = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.0, 0.0, -1.0), fov=60.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def mandelbulb(**cfg_kw):
    """Preset 2 (index.html:821-855): Cornell walls + Mandelbulb SDF."""
    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.5, 1.5), vec4(0.5)
        MAT_WHITE, SDF, vec3(0.0), vec4(0.0)
    """, sdf_shapes=[SdfShape.MANDELBULB])
    camera = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.15, 0.15, -1.0), fov=45.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def menger_sponge(**cfg_kw):
    """Preset 3 (index.html:856-877): wax Menger sponge under the cubemap."""
    scene = parse_scene(
        "MAT_COAT_WAX, SDF, vec3(0.0), vec4(1.0)",
        sdf_shapes=[SdfShape.MENGER_SPONGE])
    camera = Camera.make(origin=(0.0, 0.0, 2.0), lookat=(0.0, 0.0, -1.0), fov=33.0)
    cfg = _cfg(use_cubemap=True, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def mis_demo(**cfg_kw):
    """Preset 4 (index.html:878-908): tiny light occluded by an SDF box —
    the classic NEE/MIS stress case."""
    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.8, 0.0), vec4(0.05)
        MAT_WHITE, SDF, vec3(0.0, 1.0, 0.0), vec4(0.8, 0.1, 0.8, 0.0)
    """, sdf_shapes=[SdfShape.BOX])
    camera = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.0, 0.0, -1.0), fov=90.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


_RESTIR_9_LIGHTS = """
    MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
    MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
    MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
    MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
    MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
    MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
    MAT_LIGHT_4, SPHERE, vec3(-0.8, 1.8, -0.8), vec4(0.03)
    MAT_LIGHT_CANDLE_4, SPHERE, vec3(0.8, 1.8, -0.8), vec4(0.03)
    MAT_LIGHT_HALOGEN_4, SPHERE, vec3(-0.8, 1.8, 0.8), vec4(0.03)
    MAT_LIGHT_4, SPHERE, vec3(0.8, 1.8, 0.8), vec4(0.03)
    MAT_LIGHT_4, SPHERE, vec3(0.0, 1.8, 0.0), vec4(0.02)
    MAT_LIGHT_CANDLE_4, SPHERE, vec3(-0.4, 1.6, -0.4), vec4(0.02)
    MAT_LIGHT_HALOGEN_4, SPHERE, vec3(0.4, 1.6, -0.4), vec4(0.02)
    MAT_LIGHT_4, SPHERE, vec3(-0.4, 1.6, 0.4), vec4(0.02)
    MAT_LIGHT_CANDLE_4, SPHERE, vec3(0.4, 1.6, 0.4), vec4(0.02)
    MAT_REFR_CLEAR, SPHERE, vec3(-0.5, -0.5, 0.0), vec4(0.4)
    MAT_MIRROR, SPHERE, vec3(0.5, -0.5, 0.0), vec4(0.4)
    MAT_WHITE, SDF, vec3(0.0, 0.0, 0.0), vec4(0.3, 0.05, 0.3, 0.0)
"""


def restir_demo(**cfg_kw):
    """Preset 5 (index.html:909-964): 9 small lights + glass/mirror spheres,
    ReSTIR enabled."""
    scene = parse_scene(_RESTIR_9_LIGHTS, sdf_shapes=[SdfShape.ROUND_BOX])
    camera = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.0, 0.0, -1.0), fov=60.0)
    cfg = _cfg(use_restir=True, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def _grid_lights():
    """Preset 6's 48 ceiling lights (index.html:965-1014): a 5x? grid at
    y=1.9 (r=0.02) plus a 4x4 grid at y=1.5 (r=0.015), cycling the three
    light material colors."""
    mats = ["MAT_LIGHT_4", "MAT_LIGHT_CANDLE_4", "MAT_LIGHT_HALOGEN_4"]
    lines = []
    k = 0
    for z in (-1.2, -0.6, 0.0, 0.6, 1.2):
        for x in (-1.2, -0.6, 0.0, 0.6, 1.2):
            lines.append(f"{mats[k % 3]}, SPHERE, vec3({x}, 1.9, {z}), vec4(0.02)")
            k += 1
    # second layer: 4x4 at y=1.5, material cycle restarting at MAT_LIGHT_4
    k = 0
    for z in (-0.9, -0.3, 0.3, 0.9):
        for x in (-0.9, -0.3, 0.3, 0.9):
            lines.append(f"{mats[k % 3]}, SPHERE, vec3({x}, 1.5, {z}), vec4(0.015)")
            k += 1
    return "\n".join(lines)


def restir_stress(**cfg_kw):
    """Preset 6 (index.html:965-1014): 41+ lights in two ceiling grids —
    the many-light showcase where ReSTIR beats per-light NEE."""
    text = """
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(3.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(3.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(3.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(3.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(3.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(3.0)
    """ + _grid_lights() + """
        MAT_REFR_CLEAR, SPHERE, vec3(-0.7, -0.5, 0.0), vec4(0.3)
        MAT_MIRROR, SPHERE, vec3(0.7, -0.5, 0.0), vec4(0.3)
        MAT_WHITE, SDF, vec3(0.0, 0.0, 0.0), vec4(0.4, 0.05, 0.4, 0.0)
    """
    scene = parse_scene(text, sdf_shapes=[SdfShape.ROUND_BOX])
    camera = Camera.make(origin=(0.0, 0.0, 2.5), lookat=(0.0, 0.0, -1.0), fov=60.0)
    cfg = _cfg(use_restir=True, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def animated_restir(**cfg_kw):
    """Preset 7 (index.html:1015-1092): 10 moving lights, real-time budget
    (ANIMATED_CONFIG: 6 bounces, EMA accumulation, ReSTIR on)."""
    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.7, 0.0), vec4(0.04)
        MAT_LIGHT_CANDLE_4, SPHERE, vec3(0.8, 1.5, 0.8), vec4(0.03)
        MAT_LIGHT_HALOGEN_4, SPHERE, vec3(-0.8, 1.5, 0.8), vec4(0.03)
        MAT_LIGHT_4, SPHERE, vec3(0.8, 1.5, -0.8), vec4(0.03)
        MAT_LIGHT_CANDLE_4, SPHERE, vec3(-0.8, 1.5, -0.8), vec4(0.03)
        MAT_LIGHT_HALOGEN_4, SPHERE, vec3(0.0, 1.3, 1.2), vec4(0.025)
        MAT_LIGHT_4, SPHERE, vec3(1.2, 1.3, 0.0), vec4(0.025)
        MAT_LIGHT_CANDLE_4, SPHERE, vec3(0.0, 1.3, -1.2), vec4(0.025)
        MAT_LIGHT_HALOGEN_4, SPHERE, vec3(-1.2, 1.3, 0.0), vec4(0.025)
        MAT_REFR_CLEAR, SPHERE, vec3(-0.4, -0.3, 0.4), vec4(0.35)
        MAT_MIRROR, SPHERE, vec3(0.4, -0.3, -0.4), vec4(0.35)
        MAT_METAL, SDF, vec3(0.0, -0.2, 0.0), vec4(0.3, 0.05, 0.3, 0.0)
    """, sdf_shapes=[SdfShape.ROUND_BOX])
    camera = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.0, 0.0, -1.0), fov=60.0)
    cfg = _cfg(base=ANIMATED_CONFIG, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def spectral_caustics(**cfg_kw):
    """Preset 8 (index.html:1093-1146): dispersive flint sphere + mirror +
    fog (vol_cornell_spectral — BASELINE config 5)."""
    scene = parse_scene("""
        MAT_CORNELL_WHITE,  PLANE,  vec3( 0.0, 1.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE,  PLANE,  vec3( 0.0,-1.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE,  PLANE,  vec3( 0.0, 0.0, 1.0), vec4(2.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_RED,    PLANE,  vec3( 1.0, 0.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_CORNELL_GREEN,  PLANE,  vec3(-1.0, 0.0, 0.0), vec4(1.5, 0.0, 0.0, 0.0)
        MAT_LIGHT_DEMO,     SPHERE, vec3( 0.0, 1.38,-1.0), vec4(0.14, 0.0, 0.0, 0.0)
        MAT_LIGHT_CANDLE_4, SPHERE, vec3(-0.85, 1.25,-1.8), vec4(0.14, 0.0, 0.0, 0.0)
        MAT_SPECTRAL_FLINT, SPHERE, vec3( 0.05,-0.45,-1.15), vec4(0.55, 0.0, 0.0, 0.0)
        MAT_CORNELL_WHITE,  BOX,    vec3( 0.65,-1.2,-1.7), vec4(0.65, 0.0, 0.0, 0.0)
        MAT_MIRROR,         SPHERE, vec3(-0.9,-1.05,-2.05), vec4(0.45, 0.0, 0.0, 0.0)
    """)
    camera = Camera.make(origin=(0.0, 0.0, 2.2), lookat=(0.0, -0.15, -1.0), fov=60.0)
    cfg = _cfg(use_spectral=True, use_volumetrics=True,
               use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def textured_cornell(**cfg_kw):
    """Framework extra: the Cornell box with an IMAGE1-textured diffuse
    sphere — the reference's default-look image-texture path (raytracer
    .glsl:726-772 IMAGE branch + spherical UV 1055-1059).  Ships with a
    deterministic synthetic 64² texture; real tex0-3.png stacks load via
    `SceneBuilder.images` / CLI `--tex`."""
    import numpy as np
    from raytracer0_tpu.models.materials import MeshType
    from raytracer0_tpu.models.scene import SceneBuilder
    import jax.numpy as jnp

    g = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    images = np.ones((4, 64, 64, 4), np.float32)
    images[1, ..., 0] = 0.3 + 0.7 * g[None, :]
    images[1, ..., 1] = 0.3 + 0.7 * g[:, None]
    images[1, ..., 2] = 0.5 + 0.5 * np.sin(g[:, None] * 19.0) * np.cos(g[None, :] * 23.0)

    sb = SceneBuilder()
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 1.0, 0.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, -1.0, 0.0), (2.0,))
    sb.add("MAT_GREEN", MeshType.PLANE, (1.0, 0.0, 0.0), (2.0,))
    sb.add("MAT_RED", MeshType.PLANE, (-1.0, 0.0, 0.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 0.0, 1.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 0.0, -1.0), (2.0,))
    sb.add("MAT_LIGHT_4", MeshType.SPHERE, (0.0, 1.6, 0.0), (0.3,))
    sb.add("MAT_TEST", MeshType.SPHERE, (0.0, -0.8, 0.0), (0.7,))
    scene = sb.build().replace(images=jnp.asarray(images))
    camera = Camera.make(origin=(0.0, 0.0, 1.9), lookat=(0.0, -0.4, -1.0),
                         fov=60.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def textured_gloss(**cfg_kw):
    """Framework extra: a Cornell box with an IMAGE1-textured *metal*
    sphere whose texel drives BOTH color and emission-as-glossiness
    (raytracer.glsl:1812-1813) — the texel steers the bounce direction,
    exercising the gloss suffix-resume split
    (megakernel.trace_forward_gloss, round 5)."""
    import numpy as np
    from raytracer0_tpu.models.materials import (Material, MatType,
                                                 MeshType, TEX_1)
    from raytracer0_tpu.models.scene import SceneBuilder
    import jax.numpy as jnp

    g = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    images = np.ones((4, 64, 64, 4), np.float32)
    images[1, ..., 0] = 0.3 + 0.7 * g[None, :]
    images[1, ..., 1] = 0.3 + 0.7 * g[:, None]
    images[1, ..., 2] = 0.5

    gloss = Material(c=(0.9, 0.9, 0.9), e=(0.35, 0.35, 0.35),
                     t=MatType.SPEC, tex=TEX_1,
                     opts=(True, True, False, False))
    sb = SceneBuilder()
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0.0, 1.0, 0.0), (1.5,))
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0.0, -1.0, 0.0), (1.5,))
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0.0, 0.0, 1.0), (2.5,))
    sb.add("MAT_CORNELL_RED", MeshType.PLANE, (1.0, 0.0, 0.0), (1.5,))
    sb.add("MAT_CORNELL_GREEN", MeshType.PLANE, (-1.0, 0.0, 0.0), (1.5,))
    sb.add("MAT_LIGHT_4", MeshType.SPHERE, (0.0, 1.4, -1.2), (0.3,))
    sb.add(gloss, MeshType.SPHERE, (0.0, -0.7, -1.2), (0.6,))
    scene = sb.build().replace(images=jnp.asarray(images))
    camera = Camera.make(origin=(0.0, 0.0, 2.8), lookat=(0.0, 0.0, -1.0),
                         fov=50.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def cubemap_demo(cubemap=None, **cfg_kw):
    """Framework extra: an open scene under a *photographic* cubemap —
    the reference's Tropical Beach environment (index.js:302-331,
    index.html:267-270).  Pass `cubemap` as f32[6, H, W, 3] (e.g.
    `utils.image.load_cubemap_dir(".../Tropical Beach")`); defaults to a
    deterministic synthetic 256² sky so the preset is standalone."""
    import numpy as np
    import jax.numpy as jnp

    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.8, 1.2, 0.0), vec4(0.1)
        MAT_WHITE, SPHERE, vec3(0.0, -0.4, 0.0), vec4(0.6)
        MAT_MIRROR, SPHERE, vec3(-1.2, -0.4, -0.6), vec4(0.5)
    """)
    if cubemap is None:
        n = 256
        g = np.linspace(0.0, 1.0, n, dtype=np.float32)
        faces = np.zeros((6, n, n, 3), np.float32)
        for f in range(6):
            faces[f, :, :, 0] = 0.25 + 0.08 * f
            faces[f, :, :, 1] = 0.4 + 0.5 * g[:, None]
            faces[f, :, :, 2] = 0.6 + 0.4 * g[None, :]
        cubemap = faces
    scene = scene.replace(cubemap=jnp.asarray(np.asarray(cubemap, np.float32)),
                          cubemap_is_procedural=False)
    camera = Camera.make(origin=(0.0, 0.2, 2.6), lookat=(0.0, -0.2, -1.0),
                         fov=60.0)
    cfg = _cfg(use_cubemap=True, use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


def textured_emitter(**cfg_kw):
    """Framework extra (round 4): the Cornell box whose LIGHT sphere
    carries an IMAGE1 texture on color AND emission, plus the
    image-textured diffuse sphere — exercises both deferred-record
    kinds of the imgtex megakernel split at once (terminal emissive-hit
    records + throughput-ratio groups; raytracer.glsl:2071-2090)."""
    import numpy as np
    from raytracer0_tpu.models.materials import Material, MatType, MeshType, TEX_1
    from raytracer0_tpu.models.scene import SceneBuilder
    import jax.numpy as jnp

    g = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    images = np.ones((4, 64, 64, 4), np.float32)
    images[1, ..., 0] = 0.3 + 0.7 * g[None, :]
    images[1, ..., 1] = 0.3 + 0.7 * g[:, None]
    images[1, ..., 2] = 0.5 + 0.5 * np.sin(g[:, None] * 19.0) \
        * np.cos(g[None, :] * 23.0)

    tex_light = Material(c=(1.0, 1.0, 1.0), e=(8.0, 7.0, 6.0),
                         t=MatType.LIGHT, tex=TEX_1,
                         opts=(True, True, False, False))
    sb = SceneBuilder()
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 1.0, 0.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, -1.0, 0.0), (2.0,))
    sb.add("MAT_GREEN", MeshType.PLANE, (1.0, 0.0, 0.0), (2.0,))
    sb.add("MAT_RED", MeshType.PLANE, (-1.0, 0.0, 0.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 0.0, 1.0), (2.0,))
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 0.0, -1.0), (2.0,))
    sb.add(tex_light, MeshType.SPHERE, (0.0, 1.6, 0.0), (0.3,))
    sb.add("MAT_TEST", MeshType.SPHERE, (0.0, -0.8, 0.0), (0.7,))
    scene = sb.build().replace(images=jnp.asarray(images))
    camera = Camera.make(origin=(0.0, 0.0, 1.9), lookat=(0.0, -0.4, -1.0),
                         fov=60.0)
    cfg = _cfg(use_procedural_sky=False, **cfg_kw)
    return scene, camera, cfg


PRESETS = {
    "cornell_default": cornell_default,
    "default": default_scene,
    "cornell_box": cornell_box,
    "mandelbulb": mandelbulb,
    "menger_sponge": menger_sponge,
    "mis_demo": mis_demo,
    "restir_demo": restir_demo,
    "restir_stress": restir_stress,
    "animated_restir": animated_restir,
    "spectral_caustics": spectral_caustics,
    "textured_cornell": textured_cornell,
    "textured_gloss": textured_gloss,
    "textured_emitter": textured_emitter,
    "cubemap_demo": cubemap_demo,
}

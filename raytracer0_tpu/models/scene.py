"""Scene representation: a pytree of SoA device arrays.

The reference injects scenes into the kernel as generated GLSL text —
`const Mesh meshes[]`, `light_index[]`, and `sdf_meshes[i] = ...` lines
spliced at `#scene` / `#sdf_meshes` markers (index.html:610-729,
tools.js:47-51) — so every scene edit is a shader recompile.  Here a scene
is *data*: structure-of-arrays jnp arrays carried through `jit`.  Editing
positions/colors/lights re-traces nothing; only changing the number of
meshes (array shapes) or feature flags triggers a re-jit, mirroring the
reference's compile-time specialization where it actually matters.

All continuous fields (positions, joker params, colors, emission, IOR,
texture data) are differentiable leaves — the scene pytree is the
parameter vector for gradient-based optimization.

Indexing convention matches the reference: analytic meshes first, then SDF
entries, so SDF ordinal `i` is global mesh index `num_analytic + i`
(raytracer.glsl:990, index.html:703-717).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp
from flax import struct

from raytracer0_tpu import rng as _rng
from raytracer0_tpu.models.materials import (
    MATERIALS, Material, MatType, MeshType, SdfShape, TexType,
)


@struct.dataclass
class Scene:
    # --- geometry (differentiable) ---
    pos: Any        # f32[N, 3] position / plane normal
    joker: Any      # f32[N, 4] multi-purpose params (radius, plane w, box size, sdf params)
    aux: Any        # f32[N, 12] extra SDF params (triangle/quad vertices rel. to pos)
    # --- geometry (discrete) ---
    mesh_type: Any  # i32[N] MeshType codes
    sdf_shape: Any  # i32[N] SdfShape codes (-1 for non-SDF entries)
    # --- materials (differentiable) ---
    color: Any      # f32[N, 3]
    emission: Any   # f32[N, 3] (glossiness for SPEC)
    ior: Any        # f32[N] (negative = spectral Cauchy A)
    tex_cmask: Any  # f32[N, 3]
    tex_emask: Any  # f32[N, 3]
    tex_params: Any  # f32[N, 4]
    # --- materials (discrete) ---
    mat_type: Any   # i32[N]
    tex_type: Any   # i32[N]
    opts: Any       # bool[N, 4] (color tex, emission tex, bump, backface cull)
    # --- lights ---
    light_idx: Any  # i32[L], padded with -1
    # --- texture assets (differentiable) ---
    images: Any     # f32[4, TH, TW, 4] image textures (u_tex0..3)
    noise: Any      # f32[256, 256, 4] noise LUT (replaces rgba_noise256)
    cubemap: Any    # f32[6, CH, CW, 3] environment cubemap
    # --- static structure (part of the jit cache key) ---
    num_analytic: int = struct.field(pytree_node=False, default=0)
    num_sdfs: int = struct.field(pytree_node=False, default=0)
    use_sphere: bool = struct.field(pytree_node=False, default=False)
    use_plane: bool = struct.field(pytree_node=False, default=False)
    use_box: bool = struct.field(pytree_node=False, default=False)
    tex_types_used: tuple = struct.field(pytree_node=False, default=())
    # Static SDF shape selection per SDF entry (the reference's per-SDF
    # dropdown compiles shape choice into the kernel, index.html:703-717;
    # here it specializes the traced program the same way).
    sdf_shapes_static: tuple = struct.field(pytree_node=False, default=())
    # Static per-primitive-type row indices (the scene's type layout is
    # build-time data, like the reference's U_SPHERE/U_PLANE/U_BOX consts):
    # lets the intersector evaluate each formula only over rows of its
    # type instead of masking the full mesh array.
    sphere_rows: tuple = struct.field(pytree_node=False, default=())
    plane_rows: tuple = struct.field(pytree_node=False, default=())
    box_rows: tuple = struct.field(pytree_node=False, default=())
    # Full static structure mirrors (types and light slots are build-time
    # facts; values like positions/colors stay traced/differentiable).
    # These let specialized kernels (ops.megakernel) resolve all dispatch
    # at trace time, like the reference's generated constant arrays.
    mesh_types_static: tuple = struct.field(pytree_node=False, default=())
    mat_types_static: tuple = struct.field(pytree_node=False, default=())
    lights_static: tuple = struct.field(pytree_node=False, default=())
    # Per-mesh texture type and (color-tex, emission-tex) opts — static
    # like the types above (the reference folds them into the generated
    # GLSL constants); lets ops.megakernel specialize texture evaluation.
    tex_types_static: tuple = struct.field(pytree_node=False, default=())
    opts_static: tuple = struct.field(pytree_node=False, default=())
    # True when `cubemap` is the procedural fallback (sky.default_cubemap):
    # its texels are formula data, so ops.megakernel can recompute them
    # in-kernel instead of gathering.  Loading a real cubemap (CLI
    # --cubemap, SceneBuilder.cubemap) leaves/sets this False.
    cubemap_is_procedural: bool = struct.field(pytree_node=False,
                                               default=False)

    @property
    def num_meshes(self) -> int:
        return self.num_analytic + self.num_sdfs

    @property
    def num_lights(self) -> int:
        return int(self.light_idx.shape[0])


def _as_mat(mat: Union[str, Material]) -> tuple[str, Material]:
    if isinstance(mat, str):
        return mat, MATERIALS[mat]
    return "", mat


class SceneBuilder:
    """Programmatic scene construction (TPU-native replacement for the
    textarea DSL; `models.dsl` parses the reference's text format into
    this builder)."""

    def __init__(self):
        self._rows = []          # analytic rows
        self._sdf_rows = []      # SDF rows (always packed after analytic)
        self._images = None
        self._cubemap = None
        self._explicit_lights: Optional[Sequence[int]] = None

    def add(self, mat: Union[str, Material], mesh_type: MeshType,
            pos: Sequence[float], joker: Sequence[float],
            sdf_shape: SdfShape = SdfShape.BOX,
            aux: Optional[Sequence[float]] = None):
        """Add one mesh row (one DSL line: `MAT, TYPE, vec3(pos), vec4(joker)`).

        `aux` carries extra SDF parameters beyond the 4 joker floats —
        TRIANGLE uses aux[0:9] as 3 vertices, QUAD aux[0:12] as 4
        vertices, all relative to `pos` (raytracer.glsl:537-576)."""
        name, m = _as_mat(mat)
        joker = tuple(joker) + (0.0,) * (4 - len(joker))
        aux = tuple(aux) if aux is not None else ()
        aux = aux + (0.0,) * (12 - len(aux))
        row = dict(name=name, mat=m, mesh_type=MeshType(mesh_type),
                   pos=tuple(pos), joker=joker[:4], sdf_shape=SdfShape(sdf_shape),
                   aux=aux[:12])
        if row["mesh_type"] in (MeshType.SDF, MeshType.GRID_SDF):
            self._sdf_rows.append(row)
        else:
            self._rows.append(row)
        return self

    def images(self, images):
        """Assign the 4 image textures: f32[4, TH, TW, 4] in [0, 1]."""
        self._images = np.asarray(images, np.float32)
        return self

    def cubemap(self, faces):
        """Assign a 6-face environment map: f32[6, CH, CW, 3]."""
        self._cubemap = np.asarray(faces, np.float32)
        return self

    def lights(self, indices: Sequence[int]):
        """Override automatic light detection with explicit mesh indices."""
        self._explicit_lights = list(indices)
        return self

    def build(self) -> Scene:
        rows = self._rows + self._sdf_rows
        n = len(rows)
        if n == 0:
            raise ValueError("scene has no meshes")

        pos = np.zeros((n, 3), np.float32)
        joker = np.zeros((n, 4), np.float32)
        aux = np.zeros((n, 12), np.float32)
        mesh_type = np.zeros((n,), np.int32)
        sdf_shape = np.full((n,), -1, np.int32)
        color = np.zeros((n, 3), np.float32)
        emission = np.zeros((n, 3), np.float32)
        ior = np.zeros((n,), np.float32)
        mat_type = np.zeros((n,), np.int32)
        tex_type = np.full((n,), int(TexType.NONE), np.int32)
        tex_cmask = np.ones((n, 3), np.float32)
        tex_emask = np.ones((n, 3), np.float32)
        tex_params = np.zeros((n, 4), np.float32)
        opts = np.zeros((n, 4), bool)

        lights = []
        for i, row in enumerate(rows):
            m = row["mat"]
            pos[i] = row["pos"]
            joker[i] = row["joker"]
            aux[i] = row.get("aux", (0.0,) * 12)
            mesh_type[i] = int(row["mesh_type"])
            if row["mesh_type"] in (MeshType.SDF, MeshType.GRID_SDF):
                sdf_shape[i] = int(row["sdf_shape"])
            color[i] = m.c
            emission[i] = m.e
            ior[i] = m.nt
            mat_type[i] = int(m.t)
            tex_type[i] = int(m.tex.t)
            tex_cmask[i] = m.tex.c_mask
            tex_emask[i] = m.tex.e_mask
            tex_params[i] = m.tex.params
            opts[i] = m.opts
            # Light auto-detection matches the reference DSL: any material
            # whose *name* contains "MAT_LIGHT" (index.html:631-634).
            if "MAT_LIGHT" in row["name"]:
                lights.append(i)

        if self._explicit_lights is not None:
            lights = list(self._explicit_lights)
        if not lights:
            lights = [-1]  # sentinel row, as in the reference (index.html:655)

        num_analytic = len(self._rows)
        num_sdfs = len(self._sdf_rows)
        types_present = {int(r["mesh_type"]) for r in self._rows}

        images = self._images if self._images is not None else np.ones((4, 1, 1, 4), np.float32)
        if self._cubemap is not None:
            cubemap = self._cubemap
            cubemap_procedural = False
        else:
            # procedural fallback so use_cubemap scenes never see black
            # (the reference always ships a photographic cubemap,
            # index.html:267-270; VERDICT r1 missing #2)
            from raytracer0_tpu.ops.sky import default_cubemap
            cubemap = default_cubemap(64)
            cubemap_procedural = True

        return Scene(
            pos=jnp.asarray(pos), joker=jnp.asarray(joker),
            aux=jnp.asarray(aux),
            mesh_type=jnp.asarray(mesh_type), sdf_shape=jnp.asarray(sdf_shape),
            color=jnp.asarray(color), emission=jnp.asarray(emission),
            ior=jnp.asarray(ior),
            tex_cmask=jnp.asarray(tex_cmask), tex_emask=jnp.asarray(tex_emask),
            tex_params=jnp.asarray(tex_params),
            mat_type=jnp.asarray(mat_type), tex_type=jnp.asarray(tex_type),
            opts=jnp.asarray(opts),
            light_idx=jnp.asarray(np.asarray(lights, np.int32)),
            images=jnp.asarray(images),
            noise=jnp.asarray(_rng.noise_lut()),
            cubemap=jnp.asarray(cubemap),
            num_analytic=num_analytic, num_sdfs=num_sdfs,
            use_sphere=int(MeshType.SPHERE) in types_present,
            use_plane=int(MeshType.PLANE) in types_present,
            use_box=int(MeshType.BOX) in types_present,
            tex_types_used=tuple(sorted({int(t) for t in tex_type if t != int(TexType.NONE)})),
            sdf_shapes_static=tuple(int(r["sdf_shape"]) for r in self._sdf_rows),
            sphere_rows=tuple(int(i) for i in np.nonzero(
                mesh_type == int(MeshType.SPHERE))[0]),
            plane_rows=tuple(int(i) for i in np.nonzero(
                mesh_type == int(MeshType.PLANE))[0]),
            box_rows=tuple(int(i) for i in np.nonzero(
                mesh_type == int(MeshType.BOX))[0]),
            mesh_types_static=tuple(int(t) for t in mesh_type),
            mat_types_static=tuple(int(t) for t in mat_type),
            lights_static=tuple(int(i) for i in lights),
            tex_types_static=tuple(int(t) for t in tex_type),
            opts_static=tuple((bool(o[0]), bool(o[1])) for o in opts),
            cubemap_is_procedural=cubemap_procedural,
        )


def animate_positions(scene: Scene, time_s, render_mode: int) -> Scene:
    """Per-frame animated mesh positions (raytracer.glsl:263-298).

    Two branches, exactly as `getAnimatedPosition`:

    * mesh indices 6..14 orbit on circular paths whose radius/speed/phase
      derive from the index (269-277) — applies to analytic *and* SDF rows
      whose global index falls in that range, as in the reference;
    * SDF rows (index >= NUM_MESHES, 281-295) additionally rotate their
      (possibly orbit-displaced) *position about the world Y axis* at
      rotSpeed=0.5 and bob vertically by sin(t*1.5)*0.05 — note the
      rotation moves the position around the origin, it is not a local
      spin.

    Applied once per frame on the scene data (the reference recomputes
    this inside every intersector call — here it is hoisted out of the
    hot loop, which is semantically identical because positions only
    depend on frame time).
    """
    if render_mode != 1:
        return scene
    n = scene.pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    animated = (idx >= 6) & (idx <= 14)
    speed = 1.0 + (idx - 6.0) * 0.2
    phase = (idx - 6.0) * 0.7
    radius = 0.6
    t = time_s
    dx = jnp.cos(t * speed + phase) * radius * 0.3
    dz = jnp.sin(t * speed + phase) * radius * 0.3
    dy = jnp.sin(t * speed * 2.0 + phase) * 0.1
    delta = jnp.stack([dx, dy, dz], axis=-1) * animated[:, None]
    pos = scene.pos + delta

    if scene.num_sdfs > 0:
        # SDF branch (raytracer.glsl:281-295): rotate position about Y.
        angle = t * 0.5  # rotSpeed = 0.5
        ca = jnp.cos(angle)
        sa = jnp.sin(angle)
        rx = pos[:, 0] * ca - pos[:, 2] * sa
        rz = pos[:, 0] * sa + pos[:, 2] * ca
        ry = pos[:, 1] + jnp.sin(t * 1.5) * 0.05
        rotated = jnp.stack([rx, ry, rz], axis=-1)
        is_sdf = jnp.arange(n) >= scene.num_analytic
        pos = jnp.where(is_sdf[:, None], rotated, pos)

    return scene.replace(pos=pos)

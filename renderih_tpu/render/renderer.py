"""Two-hand mesh renderer (reference `mano_two_hands_renderer`).

Covers the rendering capabilities the pipeline uses
(`utils/vis_utils.py:153-289`): RGB overlay from predicted orthographic
cameras (`render_rgb_orth`), RGB/masks through per-frame pinhole
intrinsics (`render_rgb_perspective`/`render_mask_perspective` — the
reference's `PerspectiveCameras`-from-`cameraIn` path,
`utils/vis_utils.py:72-80`), binary masks (`render_mask`) and
vertex-color / densepose maps (`render_densepose`). Shading is Lambertian
per-vertex (a light pointing down the camera axis), which matches the
hard-Phong look of the reference demo overlays closely enough for
visualization and mask supervision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.assets import Assets
from renderih_tpu.ops.projection import orthographic_project, pinhole_project
from renderih_tpu.render.rasterize import pick_row_block, rasterize_orthographic

_LEFT_COLOR = np.array([0.4, 0.55, 0.85])
_RIGHT_COLOR = np.array([0.85, 0.55, 0.4])


def _vertex_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted per-vertex normals. verts: (V, 3)."""
    tri = verts[faces]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # (F, 3)
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-9)


def _vertex_areas(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Per-vertex area share (1/3 of each adjacent face). verts: (V, 3)."""
    tri = verts[faces]
    fa = 0.5 * jnp.linalg.norm(
        jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
    va = jnp.zeros(verts.shape[0], verts.dtype)
    for i in range(3):
        va = va.at[faces[:, i]].add(fa / 3.0)
    return va


def _occlusion_terms(verts: jax.Array, normals: jax.Array, areas: jax.Array,
                     light_dir: jax.Array):
    """Point-based ambient occlusion + directional soft shadow, per vertex.

    Closes part of the gap to the reference's path-traced Blender renders
    (`rendering_code/step4_load_mano_diffbg.py` — its realism comes mostly
    from occlusion/contact shadows between the two hands): every vertex
    treats every other vertex as an oriented disk of its area share and
    accumulates the disk-to-point form factor

        F_ij = a_j * max(n_i.d, 0) * max(-n_j.d, 0) / (pi |d|^2 + a_j)

    (Bunnell, GPU Gems 2 ch. 14 — the classic rasterizer-era AO). The
    soft shadow reuses the same disks but weights them by alignment with
    the light direction, so one hand shades the other with a penumbra
    instead of the hard z-test a shadow map would give. All (2V, 2V)
    pairwise math — three matmul-shaped einsums on the MXU, no rays.

    Returns (ao (2V,), shadow (2V,)) in [0, 1], 1 = unoccluded.
    """
    d = verts[None, :, :] - verts[:, None, :]          # (V, V, 3) i -> j
    dist2 = jnp.sum(d * d, axis=-1)
    inv = 1.0 / jnp.sqrt(dist2 + 1e-12)
    dn = d * inv[..., None]                            # unit directions
    # receiver cosine: n_i . d_ij  -> (V_i, V_j)
    cos_r = jnp.maximum(jnp.einsum("id,ijd->ij", normals, dn), 0.0)
    # emitter cosine: -n_j . d_ij
    cos_e = jnp.maximum(-jnp.einsum("jd,ijd->ij", normals, dn), 0.0)
    ff = areas[None, :] * cos_r * cos_e / (jnp.pi * dist2 + areas[None, :])
    ff = ff * (1.0 - jnp.eye(verts.shape[0], dtype=verts.dtype))
    ao = jnp.clip(1.0 - jnp.sum(ff, axis=1), 0.0, 1.0)

    # Soft shadow: same disks, but only those toward the light occlude,
    # with a cos^8 cone for penumbra softness.
    toward_light = jnp.maximum(jnp.einsum("ijd,d->ij", dn, light_dir), 0.0)
    sh = areas[None, :] * (toward_light ** 8) * cos_e / (
        jnp.pi * dist2 + areas[None, :])
    sh = sh * (1.0 - jnp.eye(verts.shape[0], dtype=verts.dtype))
    shadow = jnp.clip(1.0 - 2.0 * jnp.sum(sh, axis=1), 0.0, 1.0)
    return ao, shadow


class TwoHandRenderer:
    """Renders the concatenated left+right MANO meshes."""

    def __init__(self, assets: Assets, img_size: int = 256):
        self.img_size = img_size
        faces_l = np.asarray(assets.left.mano.faces)
        faces_r = np.asarray(assets.right.mano.faces)
        nv = int(max(faces_l.max(), faces_r.max())) + 1
        self.faces = jnp.asarray(
            np.concatenate([faces_l, faces_r + nv]), jnp.int32
        )
        self.num_verts = nv
        self.base_colors = jnp.asarray(
            np.concatenate([
                np.tile(_LEFT_COLOR, (nv, 1)),
                np.tile(_RIGHT_COLOR, (nv, 1)),
            ]),
            jnp.float32,
        )

    def _merge(self, verts_left, verts_right):
        return jnp.concatenate([verts_left, verts_right], axis=1)  # (B, 2V, 3)

    def render_rgb_orth(self, scale, trans2d, verts_left, verts_right,
                        albedo=None, light_dir=None, light_color=None,
                        ambient=None, specular=0.0, shininess=16.0,
                        ao=0.0, soft_shadow=0.0):
        """Hard-shaded RGB from predicted per-hand cameras.

        scale/trans2d: {'left','right'} of (B,) / (B, 2).

        Optional Phong lighting (used by the synthetic-data generator to
        randomize appearance, standing in for the reference Blender
        pipeline's random materials/lighting,
        `rendering_code/step4_load_mano_diffbg.py`):
          albedo      (B, 2V, 3) or None -> fixed left/right base colors
          light_dir   (B, 3) unit vector toward the light, or None -> +z
          light_color (B, 3) diffuse intensity, default 1
          ambient     (B, 3) ambient intensity, default 0
          specular    Blinn-Phong specular weight — a static Python
                      float (trace-time switch; passing a traced array
                      fails under jit)
          ao          [0..1] point-based ambient-occlusion strength
                      (static float): darkens the ambient/diffuse terms
                      in creases and between the hands
          soft_shadow [0..1] directional soft-shadow strength (static
                      float): one hand casts a penumbra on the other
                      along light_dir. Both see `_occlusion_terms`.

        Returns (rgb (B,H,W,3), mask (B,H,W)).
        """
        v2d_l = orthographic_project(scale["left"], trans2d["left"],
                                     verts_left, self.img_size)
        v2d_r = orthographic_project(scale["right"], trans2d["right"],
                                     verts_right, self.img_size)
        v2d = jnp.concatenate([v2d_l, v2d_r], axis=1)
        verts = self._merge(verts_left, verts_right)
        return self._render_shaded(
            v2d, verts[..., 2], verts, albedo, light_dir, light_color,
            ambient, specular, shininess, ao, soft_shadow)

    def render_rgb_perspective(self, camera_in, verts_left, verts_right,
                               albedo=None, light_dir=None, light_color=None,
                               ambient=None, specular=0.0, shininess=16.0,
                               ao=0.0, soft_shadow=0.0):
        """Hard-shaded RGB through per-frame pinhole intrinsics.

        camera_in: (B, 3, 3) `cameraIn` matrices (the reference builds
        `PerspectiveCameras` from these, `utils/vis_utils.py:72-80`);
        verts_*: (B, 778, 3) in CAMERA space (+z toward the scene), e.g.
        `world @ cam_R.T + cam_t` as in `utils/compute_maskiou.py:190-198`.
        Returns (rgb (B,H,W,3), mask (B,H,W)).
        """
        verts = self._merge(verts_left, verts_right)
        v2d, depth = pinhole_project(verts, camera_in)
        return self._render_shaded(
            v2d, depth, verts, albedo, light_dir, light_color,
            ambient, specular, shininess, ao, soft_shadow)

    def render_mask_perspective(self, camera_in, verts_left, verts_right):
        """Two-hand silhouette through pinhole intrinsics (the camera the
        reference's mask tooling renders with,
        `utils/compute_maskiou.py:190-198`)."""
        _, mask = self.render_rgb_perspective(camera_in, verts_left,
                                              verts_right)
        return mask

    def _render_shaded(self, v2d, z, verts, albedo, light_dir, light_color,
                       ambient, specular, shininess, ao, soft_shadow):
        B = verts.shape[0]
        if albedo is None:
            albedo = jnp.broadcast_to(self.base_colors, (B,) + self.base_colors.shape)
        if light_dir is None:
            # default: headlight along the camera axis, Lambert clipped to
            # [0.2, 1] (the original fixed-shading look)
            light_dir = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (B, 3))
            default_light = True
        else:
            default_light = False
        if light_color is None:
            light_color = jnp.ones((B, 3))
        if ambient is None:
            ambient = jnp.zeros((B, 3))

        def one(v2d_i, z_i, verts_i, alb_i, ld_i, lc_i, amb_i):
            normals = _vertex_normals(verts_i, self.faces)
            lambert = jnp.maximum(normals @ ld_i, 0.0)  # (2V,)
            if default_light:
                lambert = jnp.clip(lambert, 0.2, 1.0)
            if ao or soft_shadow:
                areas = _vertex_areas(verts_i, self.faces)
                ao_v, sh_v = _occlusion_terms(verts_i, normals, areas, ld_i)
                if ao:
                    lambert = lambert * (1.0 - ao + ao * ao_v)
                    amb_i = amb_i[None] * (1.0 - ao + ao * ao_v)[:, None]
                if soft_shadow:
                    lambert = lambert * (1.0 - soft_shadow
                                         + soft_shadow * sh_v)
            colors = alb_i * (jnp.broadcast_to(
                amb_i if amb_i.ndim == 2 else amb_i[None],
                (normals.shape[0], 3)) + lc_i[None] * lambert[:, None])
            if specular:
                # Blinn-Phong: camera along -z, half vector of (light, view);
                # gated by n.l > 0 so back-facing (unlit) surfaces get no
                # highlight
                h = ld_i + jnp.array([0.0, 0.0, -1.0])
                h = h / (jnp.linalg.norm(h) + 1e-9)
                spec = jnp.maximum(normals @ h, 0.0) ** shininess
                spec = jnp.where(lambert > 0.0, spec, 0.0)
                colors = colors + specular * lc_i[None] * spec[:, None]
            colors = jnp.clip(colors, 0.0, 1.0)
            attrs = jnp.concatenate([colors, jnp.ones((colors.shape[0], 1))], -1)
            attr, mask, _ = rasterize_orthographic(
                v2d_i, z_i, attrs, self.faces,
                height=self.img_size, width=self.img_size,
                row_block=pick_row_block(v2d.shape[0], self.img_size,
                                         self.img_size, self.faces.shape[0]),
            )
            return attr[..., :3], mask

        return jax.vmap(one)(v2d, z, verts, albedo, light_dir,
                             light_color, ambient)

    def render_mask(self, scale, trans2d, verts_left, verts_right):
        _, mask = self.render_rgb_orth(scale, trans2d, verts_left, verts_right)
        return mask

    def render_densepose(self, scale, trans2d, verts_left, verts_right,
                         dense_colors: jax.Array):
        """Vertex-color (densepose-style) map. dense_colors: (2V, 3)."""
        v2d_l = orthographic_project(scale["left"], trans2d["left"],
                                     verts_left, self.img_size)
        v2d_r = orthographic_project(scale["right"], trans2d["right"],
                                     verts_right, self.img_size)
        v2d = jnp.concatenate([v2d_l, v2d_r], axis=1)
        verts = self._merge(verts_left, verts_right)

        def one(v2d_i, z_i):
            attr, mask, _ = rasterize_orthographic(
                v2d_i, z_i, dense_colors, self.faces,
                height=self.img_size, width=self.img_size,
                row_block=pick_row_block(v2d.shape[0], self.img_size,
                                         self.img_size, self.faces.shape[0]),
            )
            return attr, mask

        return jax.vmap(one)(v2d, verts[..., 2])

    def overlay(self, img01: jax.Array, rgb: jax.Array, mask: jax.Array,
                alpha: float = 0.9) -> jax.Array:
        """Alpha-blend the render over a background image (demo path,
        `core/test_utils.py:81-99`)."""
        m = (mask[..., None] * alpha)
        return img01 * (1 - m) + rgb * m

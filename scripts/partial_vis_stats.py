#!/usr/bin/env python
"""Visibility-statistics comparison: mesh z-buffer vs point-splat fallback.

The HOI4D partial variant rasterizes triangle meshes when they ship with a
case and otherwise falls back to a point-splat z-buffer over the scan cloud
(`data/partial.py`).  This script quantifies how close the fallback's
occlusion statistics are to the mesh-accurate rasterizer on shapes where
both are computable (synthetic oven/laptop meshes + their sampled clouds):

* per-view visible fraction under each method,
* per-point agreement (IoU of the two visible sets, using the mesh depth
  buffer as ground truth for each sampled point's visibility),
* visible fraction of the MOVING part (the occlusion statistic that matters
  for articulated pose).

Usage: python scripts/partial_vis_stats.py [n_views]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from equi_articulated_pose_tpu.data.partial import zbuffer_visible
from equi_articulated_pose_tpu.data.rasterize import (
    YFOV,
    depth_buffer,
    sample_camera,
)
from equi_articulated_pose_tpu.data.synthetic import (
    make_shape,
    sample_points_on_mesh,
)


def mesh_visible(points, tri_world, R, t, pw=320, ph=240, yfov=YFOV):
    """Per-point visibility against the mesh depth buffer (ground truth)."""
    depth, _ = depth_buffer(tri_world, R, t, pw, ph, yfov)
    cam = points @ R.T + t
    z = -cam[:, 2]
    valid = z > 1e-4
    focal = 1.0 / np.tan(yfov / 2.0)
    aspect = pw / ph
    zc = np.maximum(z, 1e-6)
    px = ((cam[:, 0] / zc * focal / aspect) * 0.5 + 0.5) * pw
    py = ((cam[:, 1] / zc * focal) * 0.5 + 0.5) * ph
    xi = np.clip(px.astype(np.int64), 0, pw - 1)
    yi = np.clip(py.astype(np.int64), 0, ph - 1)
    inside = valid & (px >= 0) & (px < pw) & (py >= 0) & (py < ph)
    tol = 0.01 + 0.01 * np.where(np.isfinite(depth[yi, xi]), depth[yi, xi], 0)
    return inside & (z <= depth[yi, xi] + tol)


def main(n_views=20):
    from equi_articulated_pose_tpu.geom.transforms import revolute_transform_np

    for shape in ("oven", "laptop"):
        rng = np.random.RandomState(0)
        verts, tris, tri_seg, joints = make_shape(shape, rng)
        base_pts, seg = sample_points_on_mesh(
            verts, tris, tri_seg, np.random.RandomState(0), density=2000.0
        )
        j = joints[1]
        vmask = np.zeros(len(verts), dtype=bool)
        vmask[np.unique(tris[tri_seg == 1])] = True
        mov = seg == 1

        # canonical state + an articulated state (door/lid swung -60 deg):
        # near-coincident surfaces vs separated parts stress the splat
        # fallback differently
        for state, theta in (("canon", 0.0), ("posed", np.deg2rad(-60.0))):
            posed_verts = verts.copy()
            pts = base_pts.copy()
            if theta != 0.0:
                posed_verts[vmask], _ = revolute_transform_np(
                    verts[vmask], j.center, j.direction, theta
                )
                pts[mov], _ = revolute_transform_np(
                    base_pts[mov], j.center, j.direction, theta
                )
            tri_world = posed_verts[tris]

            fr_m, fr_s, iou, mov_m, mov_s = [], [], [], [], []
            for v in range(n_views):
                R, t = sample_camera(np.random.RandomState(1000 + v))
                vm = mesh_visible(pts, tri_world, R, t)
                # same camera for the splat: same seed draws the same eye
                vs = zbuffer_visible(pts, np.random.RandomState(1000 + v))
                fr_m.append(vm.mean())
                fr_s.append(vs.mean())
                iou.append((vm & vs).sum() / max((vm | vs).sum(), 1))
                mov_m.append(vm[mov].mean())
                mov_s.append(vs[mov].mean())
            print(
                f"{shape}/{state}: visfrac mesh {np.mean(fr_m):.3f} "
                f"splat {np.mean(fr_s):.3f} | visible-set IoU {np.mean(iou):.3f}"
                f" | moving-part visfrac mesh {np.mean(mov_m):.3f} "
                f"splat {np.mean(mov_s):.3f}"
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)

"""Ray-cast the bunny: depth / normal / primitive-id buffers.

The example the reference never shipped (reference README.md:49 lists "Add
RayCasting Examples" as an open TODO; only a usage sketch exists at
README.md:14-33). Extracts the bunny mesh with marching cubes, builds the
Pallas cluster caster, renders a 512x512 depth+normal image, and saves both
the mesh and a PPM visualisation.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import primitive3d_tpu as p3d  # noqa: E402
from primitive3d_tpu.raycast import create_raycaster  # noqa: E402
from primitive3d_tpu.render.camera import camera_rays  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "bunny.npy")

if __name__ == "__main__":
    grid = np.load(DATA)
    v, f = p3d.marching_cubes(grid, 0.0, scale=1.0)  # unit cube
    v, f = np.asarray(v), np.asarray(f)
    print(f"mesh: {v.shape[0]} verts, {f.shape[0]} faces")

    H = W = 512
    cam = camera_rays(H, W, origin=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5),
                      fov_y=35.0)
    rc = create_raycaster(v, f, backend="pallas")
    with p3d.Timer("cast 512x512 rays: {:.3f}s"):
        hits = rc.cast(cam.origins, cam.dirs)

    depth = cam.to_image(np.asarray(hits.depth), H, W)
    normal = cam.to_image(np.asarray(hits.normals), H, W)
    fid = cam.to_image(np.asarray(hits.face_id), H, W)
    hit_frac = (fid >= 0).mean()
    print(f"hit fraction: {hit_frac:.3f}")

    # save a shaded PPM (normal-dot-light, misses black)
    light = np.array([0.3, -0.5, -0.8])
    light = light / np.linalg.norm(light)
    shade = np.clip(-(normal @ light), 0, 1)
    img = (np.where(fid >= 0, shade, 0.0) * 255).astype(np.uint8)
    with open("bunny_depth.ppm", "wb") as fh:
        fh.write(f"P5\n{W} {H}\n255\n".encode())
        fh.write(img.tobytes())
    print("wrote bunny_depth.ppm")

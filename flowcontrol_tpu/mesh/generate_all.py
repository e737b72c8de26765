"""Generate all four benchmark meshes (ref: mesh_generation/generate_all.py:14-24)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(out_dir="generated_meshes"):
    from flowcontrol_tpu.mesh.generation import (
        cavity_mesh, cylinder_mesh, lidcavity_mesh, mesh_quality, pinball_mesh,
    )
    from flowcontrol_tpu.mesh.io import write_xdmf_mesh

    out = Path(out_dir)
    out.mkdir(exist_ok=True)
    for name, gen in [
        ("cylinder", lambda: cylinder_mesh(yinf=10.0)),
        ("cavity", cavity_mesh),
        ("lidcavity", lambda: lidcavity_mesh(64, diagonal="crossed")),
        ("pinball", pinball_mesh),
    ]:
        mesh = gen()
        write_xdmf_mesh(out / f"{name}.xdmf", mesh)
        print(name, mesh_quality(mesh))


if __name__ == "__main__":
    main(*sys.argv[1:])



def test_spatial_evaluator_distorted():
    """Mapped error evaluation on distorted meshes (round-1 gap): Q1
    interpolation of a smooth field converges at O(h^2)/O(h) in L2/H1 with
    the full per-quad Jinv path (reference runs ErrorCalculator on any
    Mapping, exact_solution.h:503-649)."""
    import numpy as np
    import jax.numpy as jnp
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.errors import SpatialEvaluator

    def f(p):
        return jnp.sin(2 * np.pi * p[..., 0]) * jnp.sin(2 * np.pi * p[..., 1])

    def gf(p):
        return jnp.stack([
            2 * np.pi * jnp.cos(2 * np.pi * p[..., 0])
            * jnp.sin(2 * np.pi * p[..., 1]),
            2 * np.pi * jnp.sin(2 * np.pi * p[..., 0])
            * jnp.cos(2 * np.pi * p[..., 1])], -1)

    errs = []
    for ref in (3, 4):
        mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=ref,
                              distort=0.2)
        ev = SpatialEvaluator(mesh, 1, 3)
        u = f(jnp.asarray(mesh.dof_coordinates(1)))
        l2 = float(jnp.sqrt(jnp.sum(
            ev.jxw * (ev.values(u) - f(ev.coords)) ** 2)))
        h1 = float(jnp.sqrt(jnp.sum(ev.jxw * jnp.sum(
            (ev.gradients(u) - gf(ev.coords)) ** 2, -1))))
        errs.append((l2, h1))
    assert np.log2(errs[0][0] / errs[1][0]) > 1.7
    assert np.log2(errs[0][1] / errs[1][1]) > 0.85

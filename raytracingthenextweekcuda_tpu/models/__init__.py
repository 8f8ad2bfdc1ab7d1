"""Scene, camera, film and the wavefront integrator."""

"""End-to-end pipelines composed from ember_ray.stages."""

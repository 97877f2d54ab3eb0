"""Pipeline stages: each is `run(ds: ray.data.Dataset, ...) -> Dataset`."""

"""vrl_ray — a Ray-Data-native event-transform engine.

Reimplements the observable semantics of VRL (Vector Remap Language,
reference at /root/reference, v0.34.0) as vectorized Arrow kernels and
Ray Data pipeline stages:

- ``vrl_ray.value``     — VRL Value data model + path CRUD + arithmetic
                          (row-level reference semantics; the oracle).
- ``vrl_ray.functions`` — stdlib function kernels (parse/string/coerce/
                          object/number/timestamp/codec/checksum/ip),
                          each Arrow-in / Arrow-out with an error lane.
- ``vrl_ray.stages``    — Ray Data pipeline stages (parse, enrich,
                          route, aggregate, dedup, text analysis,
                          similarity search, multimodal plumbing).
- ``vrl_ray.sources``   — parquet readers + the deterministic synthetic
                          transcript generator.
- ``vrl_ray.pipelines`` — the flagship transcript pipeline
                          (parse → enrich → route → aggregate) with
                          checkpoint/resume, lineage and metrics, plus
                          the single-process reference evaluator.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (bench.py, CLI, test fixtures, the driver).
"""

__version__ = "0.1.0"

"""Raster core: the reference's actual domain re-expressed as Spark.

- ``fixtures``  — deterministic pixels/parts fixtures (FIXTURES.md §10/§11)
- ``queries``   — Q-R1..Q-R3 corpus queries (decimation, masked stats,
                  offset prefix-sum)
- ``pyramid``   — iterative 2× decimation pyramid (ccog's level loop)
- ``tiles``     — pixel↔tile dual representation + tile encode
- ``stats``     — per-band masked statistics (ccog _calc_stats_for_profile)
- ``cog``       — COG header build + ordered-offset assignment
"""

"""Composable DataFrame -> DataFrame operators.

Each module covers one slice of the reference's operator inventory
(SURVEY.md §2) or a training-data-pipeline extension:

- ``cleaning``    — normalization / null-fill / dedup (P2, P5, P6, U1)
- ``enrichment``  — broadcast + shuffle dim joins (J1, J2)
- ``windows``     — event-time tumbling/sliding window aggregation (A1, T2)
- ``rollup``      — the daily batch rollup pipeline (X2: A2, W1, P7, J3, A3)
- ``dedup``       — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity``  — brute-force + hyperplane-LSH + IVF cosine top-k search
- ``text``        — language-guess, quality scoring, token counts, fingerprints
- ``multimodal``  — binary-column decode/feature plumbing (stubbed decode)
- ``skew``        — salted two-phase aggregation for hot-key groupBys

Every function is pure (no session state), takes and returns DataFrames, and
works on both batch and streaming inputs unless documented otherwise.
"""

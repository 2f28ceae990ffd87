"""Runnable examples for the fuzzy_matching_ray engine.

Engine equivalents of the reference's ``fuzzy_matching/examples/``
scripts (simple/api/transliteration/algorithm-comparison/data), plus
the Ray-Data-native pipelines the reference does not have (transcript
dedup, curation, search).  Every ``main()`` is headless: it inits a
local Ray session only if none exists and leaves an existing session
alone, so the pytest smoke test can run them all in-process.
"""

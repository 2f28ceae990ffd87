"""fuzzy_matching_ray — a Ray-Data-native near-duplicate detection and
clustering engine.

A from-scratch re-expression of the capabilities of
``marginalprog/fuzzy-matching`` (reference at ``/root/reference``) on
Ray Data: conversations/agent transcripts stored as Parquet turn tables
are reassembled into documents, signed with MinHash / SimHash sketches,
bucketed by LSH bands through a skew-aware shuffle, verified with exact
Jaccard / edit-distance kernels in an actor pool, and clustered with a
distributed union-find.  Everything streams: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, ``groupby`` for the wide steps.

The reference's record-linkage surface (weighted per-field fuzzy
scoring, transliteration, blocking, consolidation — see SURVEY.md §2)
is preserved as a library layer on the same engine.
"""

__version__ = "0.1.0"

import logging as _logging


class _DropSchemaHashNoise(_logging.Filter):
    """Drop Ray's harmless "Failed to hash the schemas (for
    deduplication)" warning.  ``pa.Schema.__hash__`` raises on any
    schema carrying metadata (e.g. the ``pandas`` blob in parquet
    files we don't control, seen inside ``ReadParquet->SplitBlocks``
    before our read-boundary strip can run); Ray then falls through to
    the full unify path, so the warning is pure noise.  Installed at
    package import, which also runs in worker processes when our UDFs
    deserialize — so reduce/read tasks stay quiet too."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _DropSchemaHashNoise()
)

from fuzzy_matching_ray.config import (  # noqa: F401
    FuzzyAlgorithm,
    MatchFieldConfig,
    MatchConfig,
    TransliterationConfig,
    PipelineConfig,
)
from fuzzy_matching_ray.api import (  # noqa: F401
    create_config,
    create_matcher,
    generate_test_datasets,
    load_dataset,
    match_datasets,
    save_results,
    transliterate_dataset,
)

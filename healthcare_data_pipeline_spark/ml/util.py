"""Shared MLlib model hygiene.

``strip_training_summary`` exists because a freshly-fitted model that
retains its training summary (LogisticRegressionModel et al.) holds a
non-transient reference to the SparkSession through the summary object.
Scoring plans capture the model in their task closures, so closure
serialization then serializes the session — which works only while the
session's lazily-populated internals (e.g. the Observation registry) are
empty.  After ANY ``Dataset.observe`` use on the session (pipeline.py's
cleanse metrics ride an Observation), every subsequent scoring plan that
keeps the model UDF dies with
``NotSerializableException: ObservationManager``.

The summary is a training-time diagnostic, not part of the scoring
function, so the fix is to drop it from the model we hand to scoring.
Models reloaded from disk never carry a summary (same end state).
"""

from __future__ import annotations

import warnings

from pyspark.ml import PipelineModel
from pyspark.sql import SparkSession


def strip_training_summary(model: PipelineModel) -> PipelineModel:
    """Drop retained training summaries from every fitted stage, in place.

    Uses the JVM-side ``setSummary(None)`` (package-private in Scala, public
    in bytecode — stable across 3.x/4.x).  When the strip cannot run (no
    active session) or the JVM call fails (future API drift), the summary is
    left in place and a warning is emitted ONCE per process — silence here
    would make the eventual ``NotSerializableException: ObservationManager``
    (the crash this function exists to prevent) undiagnosable at user sites.
    """
    spark = SparkSession.getActiveSession()
    if spark is None:
        if any(getattr(s, "hasSummary", False) for s in getattr(model, "stages", [model])):
            _warn_strip_skipped("no active SparkSession")
        return model
    for stage in getattr(model, "stages", [model]):
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None or not getattr(stage, "hasSummary", False):
            continue
        try:
            jobj.setSummary(spark.sparkContext._jvm.scala.Option.apply(None))
        except Exception as exc:
            # API drift: leave the summary; scoring still works on sessions
            # that never touch the Observation registry — but say so.
            _warn_strip_skipped(f"JVM setSummary failed: {exc!r}")
    return model


_strip_warned = False


def _warn_strip_skipped(why: str) -> None:
    global _strip_warned
    if _strip_warned:
        return
    _strip_warned = True
    warnings.warn(
        f"strip_training_summary could not drop a retained training summary ({why}); "
        "scoring plans that capture this model will fail with "
        "NotSerializableException: ObservationManager on sessions that have used "
        "the Observation API",
        RuntimeWarning,
        stacklevel=3,
    )

"""ES connector surface contract tests.

No cluster and no elasticsearch-hadoop jar exist in this harness (the
reference's live backend is untestable here — documented gap), but the
configuration contract IS testable: the reader must carry the exact
format + options the connector expects, so that dropping the jar on a real
cluster is the only missing step.
"""

from __future__ import annotations

import pytest

from elastic_surv_spark.sources.elastic import ES_FORMAT, es_reader, read_es


class _RecordingReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self


class _FakeSpark:
    def __init__(self):
        self._reader = _RecordingReader()

    @property
    def read(self):
        return self._reader


def test_es_reader_contract():
    fake = _FakeSpark()
    r = es_reader(fake, "events-*", nodes="es01,es02", port=9201, fields=["ts", "user_id"])
    assert r.fmt == ES_FORMAT == "org.elasticsearch.spark.sql"
    assert r.opts["es.nodes"] == "es01,es02"
    assert r.opts["es.port"] == "9201"  # connector wants strings
    assert r.opts["es.resource"] == "events-*"
    assert r.opts["es.read.source.filter"] == "ts,user_id"


def test_read_es_fails_cleanly_without_connector(spark):
    # without the jar the failure happens at load() with the format name in
    # the message — the documented behavior of the gated surface
    with pytest.raises(Exception) as exc:
        read_es(spark, "events-*")
    assert "elasticsearch" in str(exc.value).lower() or "data source" in str(exc.value).lower()

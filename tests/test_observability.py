"""Metrics/observability tooling (nemo_curator_spark/observability.py vs
reference metrics/{constants,utils}.py)."""

from __future__ import annotations

import yaml

from nemo_curator_spark import observability as OB


def test_templates_verbatim_vs_reference():
    src_c = open("/root/reference/nemo_curator/metrics/constants.py").read()
    for name in (
        "PROMETHEUS_YAML_TEMPLATE",
        "GRAFANA_INI_TEMPLATE",
        "GRAFANA_DASHBOARD_YAML_TEMPLATE",
        "GRAFANA_DATASOURCE_YAML_TEMPLATE",
    ):
        start = src_c.index(f'{name} = """') + len(f'{name} = """')
        lit = src_c[start: src_c.index('"""', start)]
        assert lit == getattr(OB, name), name
    assert OB.GRAFANA_VERSION in src_c
    assert OB.DEFAULT_PROMETHEUS_WEB_PORT == 9090
    assert OB.DEFAULT_GRAFANA_WEB_PORT == 3000


def test_write_configs_layout(tmp_path):
    md = str(tmp_path / "metrics")
    prom = OB.write_prometheus_config(md)
    cfg = yaml.safe_load(open(prom))
    assert cfg["scrape_configs"][0]["job_name"] == "ray"
    ini = OB.write_grafana_configs(3001, 9091, md)
    assert open(ini).read().count("http_port = 3001") == 1
    ds = open(
        f"{md}/grafana/provisioning/datasources/default.yml"
    ).read()
    assert "url: http://localhost:9091" in ds
    dash = yaml.safe_load(
        open(f"{md}/grafana/provisioning/dashboards/default.yml")
    )
    assert dash["providers"][0]["options"]["path"].endswith(
        "grafana/dashboards"
    )


def test_service_discovery_edits(tmp_path):
    md = str(tmp_path / "m")
    path = OB.write_prometheus_config(md)
    # add is idempotent and reported
    calls = []
    assert OB.update_service_discovery_file(
        path, "/ray/sd.json", add=True, reload_cb=lambda: calls.append(1)
    )
    assert not OB.update_service_discovery_file(path, "/ray/sd.json", add=True)
    assert calls == [1]
    cfg = yaml.safe_load(open(path))
    assert OB.discovery_paths(cfg) == ["/ray/sd.json"]
    # remove
    assert OB.update_service_discovery_file(path, "/ray/sd.json", add=False)
    assert not OB.update_service_discovery_file(path, "/ray/sd.json", add=False)
    cfg = yaml.safe_load(open(path))
    assert OB.discovery_paths(cfg) == []


def test_lineage_exposition(tmp_path, spark):
    from pyspark.sql import functions as F

    from nemo_curator_spark.pipeline import webpages

    labeled = spark.createDataFrame(
        [
            (1, "s1", True, None, 2),
            (2, "s1", False, "word_count", 0),
            (3, "s1", False, "word_count", 1),
            (4, "s2", True, None, 0),
        ],
        "doc_id long, source_id string, keep boolean, drop_reason string, scrub_email int",
    )
    lin = webpages.lineage(labeled.coalesce(1), run_id="r1")
    path = OB.write_lineage_textfile(lin, str(tmp_path / "lineage.prom"))
    text = open(path).read()
    assert "# TYPE nemo_curator_input_docs_total counter" in text
    assert (
        'nemo_curator_input_docs_total{run_id="r1",stage="curate",source_id="s1"} 3'
        in text
    )
    assert (
        'nemo_curator_kept_docs_total{run_id="r1",stage="curate",source_id="s2"} 1'
        in text
    )
    assert (
        'nemo_curator_dropped_docs_total{run_id="r1",stage="curate",source_id="s1",reason="word_count"} 2'
        in text
    )
    assert (
        'nemo_curator_scrubbed_total{run_id="r1",stage="curate",source_id="s1",kind="email"} 3'
        in text
    )


def test_label_escaping():
    lines = OB.lineage_prometheus_lines(
        [
            {
                "run_id": 'r"1"\nx\\',
                "stage": "s",
                "source_id": "a",
                "input_count": 1,
                "kept_count": 1,
                "drop_reasons": {},
            }
        ]
    )
    joined = "\n".join(lines)
    assert 'run_id="r\\"1\\"\\nx\\\\"' in joined

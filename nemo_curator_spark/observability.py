"""Metrics / observability tooling (reference
``metrics/{constants,utils,start_prometheus_grafana}.py``), Spark-first.

The reference ships a Prometheus+Grafana launcher for its Ray clusters:
config templates, provisioning-file writers, and editing the Prometheus
scrape config's ``file_sd_configs`` service-discovery list. Binary
download/launch/pidfile process management is deployment tooling with
no Spark analogue required (Spark has its own metrics sinks), but the
CONFIG surface is portable and is exact-ported here:

* the verbatim YAML/INI templates, port/pid file names and default
  ports (constants.py:17-79);
* ``write_prometheus_config`` / ``write_grafana_configs``
  (utils.py:117-160, 233-264) — provisioning-tree and file layout,
  byte-identical rendered content (the Ray default-dashboard generator
  and the bundled Xenna dashboard JSON are Ray-gated plug points);
* the service-discovery edit as PURE functions over the parsed config
  (utils.py:307-342) plus file wrappers with an injectable reload
  callback (the reference POSTs ``/-/reload``; requests-on-localhost is
  deployment-gated here).

Spark-native half: :func:`lineage_prometheus_lines` renders the repo's
lineage/metrics tables (pipeline/webpages.lineage — the north rule's
per-partition lineage rows) in the Prometheus text exposition format,
so a curation job can drop a textfile-collector artifact per run and
the reference's dashboards have a scrape target without any Ray. The
rows arriving here are already aggregated (one per partition × source),
so the driver-side rendering is bounded.
"""

from __future__ import annotations

import os

# --- constants.py:17-79, verbatim -------------------------------------

GRAFANA_VERSION = "12.0.2"

PROMETHEUS_YAML_TEMPLATE = """
global:
  scrape_interval: 10s # Set the scrape interval to every 10 seconds. Default is every 1 minute.
  evaluation_interval: 10s # Evaluate rules every 10 seconds. The default is every 1 minute.
  # scrape_timeout is set to the global default (10s).

scrape_configs:
# Scrape from each Ray node as defined in the service_discovery.json provided by Ray.
- job_name: 'ray'
  file_sd_configs: []
"""

PROMETHEUS_PORT_FILE = "prometheus_port.txt"
PROMETHEUS_PID_FILE = "prometheus.pid"
GRAFANA_PORT_FILE = "grafana_port.txt"
GRAFANA_PID_FILE = "grafana.pid"

GRAFANA_INI_TEMPLATE = """
[security]
allow_embedding = true

[auth.anonymous]
enabled = true
org_name = Main Org.
org_role = Viewer

[paths]
provisioning = {provisioning_path}

[server]
http_port = {grafana_web_port}
"""

GRAFANA_DASHBOARD_YAML_TEMPLATE = """

apiVersion: 1

providers:
  - name: Ray    # Default dashboards provided by OSS Ray
    folder: Ray
    type: file
    options:
      path: {dashboards_path}
"""

GRAFANA_DATASOURCE_YAML_TEMPLATE = """
apiVersion: 1
datasources:
- access: proxy
  isDefault: true
  jsonData: {{}}
  name: Prometheus
  secureJsonData: {{}}
  type: prometheus
  url: {prometheus_url}
"""

DEFAULT_PROMETHEUS_WEB_PORT = 9090
DEFAULT_GRAFANA_WEB_PORT = 3000


# --- config writers ----------------------------------------------------


def write_prometheus_config(metrics_dir: str) -> str:
    """The template write from ``run_prometheus`` (utils.py:117-131)."""
    os.makedirs(metrics_dir, exist_ok=True)
    path = os.path.join(metrics_dir, "prometheus.yml")
    with open(path, "w") as f:
        f.write(PROMETHEUS_YAML_TEMPLATE)
    return path


def write_grafana_configs(grafana_web_port: int, prometheus_web_port: int,
                          metrics_dir: str) -> str:
    """utils.py:233-264 — directory tree + rendered files, byte-equal.
    The Xenna dashboard copy and Ray default-dashboard generation are
    Ray-gated (utils.py:265-305) and intentionally absent."""
    grafana_config_root = os.path.join(metrics_dir, "grafana")
    provisioning_path = os.path.join(grafana_config_root, "provisioning")
    dashboards_path = os.path.join(grafana_config_root, "dashboards")
    datasources_path = os.path.join(provisioning_path, "datasources")
    dashboards_prov_path = os.path.join(provisioning_path, "dashboards")
    for p in [grafana_config_root, provisioning_path, datasources_path,
              dashboards_path, dashboards_prov_path]:
        os.makedirs(p, exist_ok=True)

    grafana_ini_path = os.path.join(grafana_config_root, "grafana.ini")
    with open(grafana_ini_path, "w") as f:
        f.write(
            GRAFANA_INI_TEMPLATE.format(
                provisioning_path=provisioning_path,
                grafana_web_port=grafana_web_port,
            )
        )
    with open(os.path.join(dashboards_prov_path, "default.yml"), "w") as f:
        f.write(
            GRAFANA_DASHBOARD_YAML_TEMPLATE.format(
                dashboards_path=dashboards_path
            )
        )
    prometheus_url = f"http://localhost:{prometheus_web_port}"
    with open(os.path.join(datasources_path, "default.yml"), "w") as f:
        f.write(
            GRAFANA_DATASOURCE_YAML_TEMPLATE.format(
                prometheus_url=prometheus_url
            )
        )
    return grafana_ini_path


# --- service discovery (pure halves of utils.py:307-342) ---------------


def discovery_paths(prometheus_config: dict) -> list[str]:
    """utils.py:307-315."""
    paths = []
    for entry in prometheus_config["scrape_configs"][0].get(
        "file_sd_configs", []
    ):
        files = entry.get("files", [])
        if files:
            paths.extend(files)
    return paths


def add_service_discovery(prometheus_config: dict, sd_path: str) -> bool:
    """Pure half of utils.py:317-341: append a file_sd_configs entry
    when ``sd_path`` is absent; returns True when the config changed
    (the reference then rewrites the file and POSTs ``/-/reload``)."""
    if sd_path in discovery_paths(prometheus_config):
        return False
    file_sd_configs = prometheus_config["scrape_configs"][0].get(
        "file_sd_configs", []
    )
    if not file_sd_configs:
        file_sd_configs = []
        prometheus_config["scrape_configs"][0]["file_sd_configs"] = file_sd_configs
    file_sd_configs.append({"files": [sd_path]})
    return True


def remove_service_discovery(prometheus_config: dict, sd_path: str) -> bool:
    """Pure half of utils.py:343+: drop every entry referencing
    ``sd_path``; returns True when the config changed."""
    entries = prometheus_config["scrape_configs"][0].get("file_sd_configs", [])
    kept = [e for e in entries if sd_path not in (e.get("files") or [])]
    if len(kept) == len(entries):
        return False
    prometheus_config["scrape_configs"][0]["file_sd_configs"] = kept
    return True


def update_service_discovery_file(prometheus_config_path: str, sd_path: str,
                                  add: bool = True, reload_cb=None) -> bool:
    """File wrapper: load -> pure edit -> rewrite -> reload callback
    (the injectable stand-in for the reference's localhost POST)."""
    import yaml

    with open(prometheus_config_path) as f:
        config = yaml.safe_load(f)
    changed = (
        add_service_discovery(config, sd_path)
        if add
        else remove_service_discovery(config, sd_path)
    )
    if changed:
        with open(prometheus_config_path, "w") as f:
            yaml.dump(config, f)
        if reload_cb is not None:
            reload_cb()
    return changed


# --- Spark-native exposition export -------------------------------------


def _escape_label(v) -> str:
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace('"', '\\"')
    )


def lineage_prometheus_lines(rows, namespace: str = "nemo_curator") -> list[str]:
    """Render lineage rows (pipeline/webpages.lineage schema: run_id,
    stage, partition_id, source_id, input_count, kept_count,
    drop_reasons map, scrub_* sums) in the Prometheus text exposition
    format (textfile-collector contract): counters
    ``{ns}_input_docs_total``, ``{ns}_kept_docs_total``,
    ``{ns}_dropped_docs_total{reason=...}`` and
    ``{ns}_scrubbed_total{kind=...}``, labeled by run/stage/source.
    Deterministic: rows and map keys are emitted sorted."""
    base_counters: dict[tuple, int] = {}
    drop_counters: dict[tuple, int] = {}
    scrub_counters: dict[tuple, int] = {}
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        key = (d["run_id"], d["stage"], str(d["source_id"]))
        for name, col in (("input", "input_count"), ("kept", "kept_count")):
            k = key + (name,)
            base_counters[k] = base_counters.get(k, 0) + int(d[col])
        for reason, n in (d.get("drop_reasons") or {}).items():
            k = key + (str(reason),)
            drop_counters[k] = drop_counters.get(k, 0) + int(n)
        for col, v in d.items():
            if col.startswith("scrub_") and v is not None:
                k = key + (col[len("scrub_"):],)
                scrub_counters[k] = scrub_counters.get(k, 0) + int(v)

    def labels(run_id, stage, source_id, extra=()):
        parts = [
            f'run_id="{_escape_label(run_id)}"',
            f'stage="{_escape_label(stage)}"',
            f'source_id="{_escape_label(source_id)}"',
        ] + [f'{k}="{_escape_label(v)}"' for k, v in extra]
        return "{" + ",".join(parts) + "}"

    lines = []
    for which in ("input", "kept"):  # one contiguous family at a time
        lines.append(f"# TYPE {namespace}_{which}_docs_total counter")
        for (run_id, stage, source_id, w), n in sorted(base_counters.items()):
            if w == which:
                lines.append(
                    f"{namespace}_{which}_docs_total"
                    f"{labels(run_id, stage, source_id)} {n}"
                )
    lines.append(f"# TYPE {namespace}_dropped_docs_total counter")
    for (run_id, stage, source_id, reason), n in sorted(drop_counters.items()):
        lines.append(
            f"{namespace}_dropped_docs_total"
            f"{labels(run_id, stage, source_id, (('reason', reason),))} {n}"
        )
    lines.append(f"# TYPE {namespace}_scrubbed_total counter")
    for (run_id, stage, source_id, kind), n in sorted(scrub_counters.items()):
        lines.append(
            f"{namespace}_scrubbed_total"
            f"{labels(run_id, stage, source_id, (('kind', kind),))} {n}"
        )
    return lines


def write_lineage_textfile(lineage_df, path: str,
                           namespace: str = "nemo_curator") -> str:
    """Collect the (already-aggregated, bounded) lineage table and write
    the exposition file atomically (tmp + rename — the node-exporter
    textfile-collector requirement)."""
    lines = lineage_prometheus_lines(lineage_df.collect(), namespace)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path

"""Config surface tests: env overrides + JSON-valued flags mirror the
reference's flag parsing (reference ``src/args.rs:6-55``,
``src/util.rs:132-138``)."""

from __future__ import annotations

from pulsar_elasticsearch_sync_rs_spark.config import PipelineConfig, RewriteRule, from_env


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("PULSAR_ADDRESS", "pulsar://broker:6650")
    monkeypatch.setenv("ELASTICSEARCH_ADDRESS", "http://es:9200")
    monkeypatch.setenv("PULSAR_NAMESPACE", "tenant/ns")
    cfg = from_env()
    assert cfg.pulsar_addr == "pulsar://broker:6650"
    assert cfg.es_addr == "http://es:9200"
    assert cfg.pulsar_namespace == "tenant/ns"


def test_json_valued_flags():
    cfg = from_env(
        namespace_filters='{"topicA": ["p1", "p2"], "topicB": ["p3"]}',
        rate_limits='{"app1": 5, "app2": 10}',
        rewrite_rules='[{"pattern": "app-biz", "target": "app"}]',
    )
    assert cfg.namespace_filters == {"topicA": ("p1", "p2"), "topicB": ("p3",)}
    assert cfg.rate_limits == {"app1": 5, "app2": 10}
    assert cfg.rewrite_rules == (RewriteRule("app-biz", "app"),)
    assert cfg.namespace_filter_patterns == {"topicA": "(p1)|(p2)", "topicB": "(p3)"}


def test_pulsar_token_auth(monkeypatch):
    # reference src/pulsar.rs:77-84: PULSAR_TOKEN env -> token auth
    from pulsar_elasticsearch_sync_rs_spark.streaming.runner import pulsar_reader_options

    monkeypatch.setenv("PULSAR_TOKEN", "jwt-abc123")
    cfg = from_env()
    assert cfg.pulsar_token == "jwt-abc123"
    opts = pulsar_reader_options(cfg)
    assert opts["pulsar.client.authParams"] == "token:jwt-abc123"
    assert opts["pulsar.client.authPluginClassName"].endswith("AuthenticationToken")

    monkeypatch.delenv("PULSAR_TOKEN")
    opts_noauth = pulsar_reader_options(from_env())
    assert "pulsar.client.authParams" not in opts_noauth
    assert opts_noauth["topicsPattern"] == "persistent://public/default/.*"


def test_pattern_compilation():
    cfg = PipelineConfig(
        global_filters=("a", "b"),
        debug_log_patterns=(r"\[DEBU\]",),
    )
    assert cfg.global_filter_pattern == "(a)|(b)"
    assert cfg.debug_log_pattern == r"(\[DEBU\])"
    assert PipelineConfig().global_filter_pattern is None


def test_pulsar_reader_options_golden_contract():
    """Golden contract for the connector options builder: the exact
    key set and values, table-driven. The pulsar lane cannot execute
    in-sandbox (no jar/broker), so this pins what CAN be checked — the
    documented StreamNative pulsar-spark option surface. A renamed or
    misspelled key (e.g. the connector has no `subscriptionName`;
    the documented key is `predefinedSubscription`) fails HERE instead
    of silently at a customer's cluster."""
    from pulsar_elasticsearch_sync_rs_spark.streaming.runner import pulsar_reader_options

    cfg = PipelineConfig(
        pulsar_addr="pulsar://broker.example:6650",
        pulsar_namespace="tenant/ns",
        topic_regex="app-.*",
        subscription="es-sync-sub",
        batch_size=2500,
        pulsar_token="jwt-xyz",
    )
    assert pulsar_reader_options(cfg) == {
        "service.url": "pulsar://broker.example:6650",
        "topicsPattern": "persistent://tenant/ns/app-.*",
        "predefinedSubscription": "es-sync-sub",
        "maxEntriesPerTrigger": "2500",
        "pulsar.client.authPluginClassName": (
            "org.apache.pulsar.client.impl.auth.AuthenticationToken"
        ),
        "pulsar.client.authParams": "token:jwt-xyz",
    }

    # no token -> EXACTLY the unauthenticated surface, nothing extra
    assert pulsar_reader_options(PipelineConfig()) == {
        "service.url": "pulsar://localhost:6650",
        "topicsPattern": "persistent://public/default/.*",
        "predefinedSubscription": "pulsar-es-sync",
        "maxEntriesPerTrigger": "1000",
    }

    # every value a spark .options() string (the connector takes str->str)
    for k, v in pulsar_reader_options(cfg).items():
        assert isinstance(k, str) and isinstance(v, str), (k, v)

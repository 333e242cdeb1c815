"""Model registry + the registry-backed CLI commands (kt models / tune /
quant). Reference analog: kt-kernel/python/cli model registry."""

import json

from click.testing import CliRunner

from ktransformers_tpu.cli.main import cli
from ktransformers_tpu.models.registry import (
    REGISTRY,
    estimate_bytes,
    list_models,
    show_model,
)


def test_every_preset_translates_and_estimates():
    """Each catalog entry must build a ModelSpec and a size estimate —
    guards preset config keys against spec.py translator drift."""
    for name, e in REGISTRY.items():
        spec = e.spec()
        est = estimate_bytes(spec, e.quant, e.moe_quant)
        assert est["total_gb"] > 0, name
        assert est["active_gb_per_token"] > 0, name
        assert est["min_v5e_chips"] >= 1, name
        # active read set can't exceed the resident total
        assert est["active_gb_per_token"] <= est["total_gb"], name


def test_known_size_sanity():
    """Spot-check the size model against public facts: 671B at ~0.5 B/param
    for experts lands in the 330-400 GB range; the 16B lite model fits one
    v5e; the 1T K2 does not."""
    v3 = estimate_bytes(
        REGISTRY["deepseek-v3"].spec(), "int8", "int4_g"
    )
    assert 300 < v3["total_gb"] < 420
    assert not v3["fits_v5e"]
    lite = estimate_bytes(
        REGISTRY["deepseek-v2-lite"].spec(), "int8", "int4_g"
    )
    assert lite["fits_v5e"]
    # bench.py measures 9.77 GB materialized for this config; the
    # estimator must agree within ~10%
    assert abs(lite["total_gb"] - 9.77) / 9.77 < 0.10
    k2 = estimate_bytes(REGISTRY["kimi-k2"].spec(), "int8", "int4_g")
    assert k2["total_gb"] > 400


def test_list_and_show():
    rows = list_models()
    assert {r["name"] for r in rows} == set(REGISTRY)
    info = show_model("deepseek-v3")
    assert info["attention"] == "mla"
    assert info["experts"] == 256
    assert "offload" in info["recommended"]


def test_cli_models_and_tune():
    r = CliRunner().invoke(cli, ["models", "list"])
    assert r.exit_code == 0, r.output
    assert "deepseek-v3" in r.output and "kimi-k2" in r.output

    r = CliRunner().invoke(cli, ["models", "show", "qwen3-235b-a22b"])
    assert r.exit_code == 0, r.output
    assert json.loads(r.output)["layers"] == 94

    r = CliRunner().invoke(cli, ["models", "show", "nope"])
    assert r.exit_code != 0

    r = CliRunner().invoke(cli, ["tune", "--model", "deepseek-v2-lite"])
    assert r.exit_code == 0, r.output
    plan = json.loads(r.output)
    assert plan["mode"] == "resident"
    assert plan["serve"]["num_pages"] > 64
    # bandwidth-bound estimate should be in the right decade vs the
    # measured 224 tok/s on this config
    assert 100 < plan["est_decode_tok_s_single"] < 2000

    r = CliRunner().invoke(cli, ["tune", "--model", "deepseek-r1"])
    plan = json.loads(r.output)
    assert "host-offload" in plan["mode"]


def test_tune_emits_server_config(tmp_path):
    """tune --emit-server-config composes with kt serve --config-file."""
    from ktransformers_tpu.serving.config import ServerConfig

    out = str(tmp_path / "server.json")
    r = CliRunner().invoke(
        cli, ["tune", "--model", "deepseek-r1", "--emit-server-config", out]
    )
    assert r.exit_code == 0, r.output
    sc = ServerConfig.from_file(out)
    assert sc.offload is True
    assert sc.num_pages >= 64 and sc.max_batch_size >= 1


def test_cli_quant(tmp_path):
    from tests.test_cli_checkpoint import _make_hf_dir

    src = _make_hf_dir(tmp_path)
    out = str(tmp_path / "packed")
    r = CliRunner().invoke(
        cli, ["quant", src, out, "--quant", "int8", "--moe-quant", "int4_g"]
    )
    assert r.exit_code == 0, r.output
    report, _ = json.JSONDecoder().raw_decode(
        r.output[r.output.index("{"):]
    )
    assert "int4_g" in report["kinds"]
    assert report["kinds"]["int4_g"]["tensors"] > 0

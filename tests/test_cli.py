"""Reference-compatible CLI (smart_ocr_spark/cli.py): same commands,
option names, and YAML config keys as the reference ``socr`` CLI
(``src/socr/cli.py``), wired to the per-document control-flow kernel.
"""

from __future__ import annotations

import json

import pytest
from click.testing import CliRunner

from smart_ocr_spark import cli as C
from smart_ocr_spark.sources.corpus import build_pdf


@pytest.fixture()
def runner():
    return CliRunner()


def _pdf_with_figure() -> bytes:
    return build_pdf(
        [[(72.0, 720.0, "a body line for the compat cli")]],
        raw_page_prefix=["150 300 200 220 re S"],
    )


def test_help_exposes_reference_options(runner):
    """The option surface the reference CLI tests pin (cli.py:31-45,
    114-118): --multi-engine, --consensus-llm, --no-native-first,
    --save-figures, --config."""
    r = runner.invoke(C.process, ["--help"])
    assert r.exit_code == 0
    for opt in (
        "--multi-engine", "--consensus-llm", "--no-native-first",
        "--save-figures", "--no-audit", "--config", "--dry-run",
    ):
        assert opt in r.output, opt


def test_engine_aliases_map_to_variants():
    assert C.to_variant("gemini") == "layout"
    assert C.to_variant("mistral") == "layout_alt"
    assert C.to_variant("layout") == "layout"
    with pytest.raises(Exception):
        C.to_variant("made-up-engine")


def test_process_writes_markdown_with_figures(runner, tmp_path):
    src = tmp_path / "doc.pdf"
    src.write_bytes(_pdf_with_figure())
    out = tmp_path / "out"
    r = runner.invoke(
        C.process, [str(src), "-o", str(out), "--save-figures", "-q"]
    )
    assert r.exit_code == 0, r.output
    md = (out / "doc" / "doc.md").read_text()
    assert md.startswith("a body line for the compat cli")
    assert "**Figure 1** (page 1): [stub] drawing region, 200x220 pt" in md


def test_consensus_llm_rejected_honestly(runner, tmp_path):
    src = tmp_path / "doc.pdf"
    src.write_bytes(_pdf_with_figure())
    r = runner.invoke(
        C.process, [str(src), "--multi-engine", "gemini,mistral",
                    "--consensus-llm", "qwen3.5:4b"]
    )
    assert r.exit_code != 0
    assert "Ollama" in r.output


def test_batch_skip_and_dry_run(runner, tmp_path):
    """Reference batch semantics (orchestrator.py:144-203): dry-run
    lists, completed files are skipped on re-run, --reprocess redoes."""
    body = "word " * 60  # over the 50-word audit floor
    (tmp_path / "a.html").write_text(
        f"<html><body><p>first {body}</p></body></html>"
    )
    (tmp_path / "b.html").write_text(
        f"<html><body><p>second {body}</p></body></html>"
    )
    out = tmp_path / "out"

    r = runner.invoke(C.batch, [str(tmp_path), "-o", str(out), "--dry-run"])
    assert r.exit_code == 0 and "a.html" in r.output and "b.html" in r.output
    assert not out.exists()  # dry run writes nothing

    r = runner.invoke(C.batch, [str(tmp_path), "-o", str(out), "-q"])
    assert r.exit_code == 0
    meta = json.loads((out / "metadata.json").read_text())
    done = {k.split("/")[-1] for k in meta}
    assert done == {"a.html", "b.html"}

    # second run: everything already processed -> dry-run lists nothing
    r = runner.invoke(C.batch, [str(tmp_path), "-o", str(out), "--dry-run"])
    assert r.exit_code == 0 and "a.html" not in r.output


def test_yaml_config_round_trip(tmp_path):
    """Reference YAML keys load through load_yaml_config
    (core/config.py:160-205 key schema)."""
    import yaml

    cfg = tmp_path / "conf.yaml"
    cfg.write_text(yaml.dump({
        "primary_engine": "gemini",
        "fallback_chain": ["mistral", "nougat"],
        "multi_engine": ["gemini", "mistral"],
        "native_first": False,
        "save_figures": True,
        "audit_min_words": 25,
        "unknown_future_key": 1,
    }))
    data = C.load_yaml_config(cfg)
    assert data["primary_engine"] == "gemini"
    assert data["fallback_chain"] == ["mistral", "nougat"]
    assert data["multi_engine"] == ["gemini", "mistral"]
    assert data["native_first"] is False
    assert data["save_figures"] is True
    assert data["audit_min_words"] == 25
    assert "unknown_future_key" not in data

    opts = C._build_options(config_path=cfg)
    assert opts["chain"] == ["layout", "layout_alt", "basic"]
    assert opts["native_first"] is False
    assert opts["save_figures"] is True
    assert opts["multi_engine"] == ["layout", "layout_alt"]


def test_legacy_fallback_engine_key(tmp_path):
    import yaml

    cfg = tmp_path / "conf.yaml"
    cfg.write_text(yaml.dump({"fallback_engine": "glm"}))
    assert C.load_yaml_config(cfg)["fallback_chain"] == ["glm"]


def test_process_recovers_scanned_pdf(runner, tmp_path):
    """A scanned (image-only) PDF with a recoverable layer goes through
    the raster tier end-to-end from the CLI."""
    from smart_ocr_spark.kernel.raster import encode_scan_text

    texts = [("delta echo foxtrot golf " * 15).strip()]
    src = tmp_path / "scan.pdf"
    src.write_bytes(build_pdf(
        [[]],
        image_pages=[True],
        image_streams=[encode_scan_text(texts[0])],
    ))
    out = tmp_path / "out"
    r = runner.invoke(C.process, [str(src), "-o", str(out)])
    assert r.exit_code == 0, r.output
    assert "status: success" in r.output
    md = (out / "scan" / "scan.md").read_text()
    assert md == texts[0]


def test_process_ruled_table_uses_structured_native(runner, tmp_path):
    """Review fix: a ruled-table PDF through the CLI must emit the P14
    markdown table (structured native output), matching the pipeline
    and the reference born_digital.py:369-372 — not the plain line
    dump."""
    body = ("every column here lists one measured value " * 3).strip()
    ops = []
    for y in (500, 540, 580, 620):
        ops.append(f"100 {y} m 460 {y} l S")
    for x in (100, 220, 340, 460):
        ops.append(f"{x} 500 m {x} 620 l S")
    placements = [(72.0, 700.0, body)]
    for ri, y in enumerate((595.0, 555.0, 515.0)):
        for ci, x in enumerate((105.0, 225.0, 345.0)):
            placements.append((x, y, f"cell{ri}{ci}"))
    src = tmp_path / "table.pdf"
    src.write_bytes(build_pdf([placements], raw_page_prefix=[" ".join(ops)]))
    out = tmp_path / "out"
    r = runner.invoke(C.process, [str(src), "-o", str(out), "-q"])
    assert r.exit_code == 0, r.output
    md = (out / "table" / "table.md").read_text()
    assert "| cell00 | cell01 | cell02 |" in md
    assert "| --- | --- | --- |" in md


def test_fallback_alone_extends_config_chain(tmp_path):
    """Review fix: --fallback without --primary extends the configured
    chain instead of silently resetting the primary to auto."""
    import yaml

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.dump({"primary_engine": "glm"}))
    opts = C._build_options(config_path=cfg, fallback="nougat")
    assert opts["chain"] == ["density", "basic"]
    # without a config: default-primary + fallback
    opts2 = C._build_options(fallback="nougat")
    assert opts2["chain"] == ["layout", "basic"]


def test_yaml_llm_consensus_rejected(tmp_path):
    """Review fix: YAML-requested LLM consensus fails loudly, same as
    the --consensus-llm flag (no silent degradation)."""
    import yaml

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.dump({"consensus_ollama_model": "qwen3.5:4b"}))
    with pytest.raises(Exception):
        C._build_options(config_path=cfg)

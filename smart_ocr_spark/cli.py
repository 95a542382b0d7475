"""Reference-compatible command-line surface.

Mirrors the ``socr`` CLI (``src/socr/cli.py``): same commands
(``process`` / ``batch`` / ``engines``), same option names, same YAML
config keys — so a reference user's invocations and config files keep
working against this engine.  The cloud/VLM engine names map onto the
in-process kernel variants (the same mapping the cost model uses,
``operators/extract.VARIANT_COST_MICROUSD``); genuinely cloud-only
features (``--consensus-llm`` with an Ollama model) are accepted at
parse time for compatibility and rejected at RUN time with an explicit
error rather than silently degraded.

Single documents run through the per-document 5-phase control-flow
kernel (``kernel.orchestrate``) — the same assess/audit/repair/
consensus/assembly rules the distributed pipeline applies.  Directory
batches keep the reference's sequential skip-filter semantics
(``orchestrator.py:144-203``); the Spark path for real corpora is
``jobs/extract.py`` (checkpointed, resumable).
"""

from __future__ import annotations

import json
from pathlib import Path

import click

# reference engine name -> kernel variant (cost-model families:
# gemini-analog = layout, mistral-analog = layout_alt; local engines
# map to the free local kernels)
ENGINE_TO_VARIANT = {
    "gemini": "layout",
    "mistral": "layout_alt",
    "glm": "density",
    "nougat": "basic",
    "marker": "raw",
    "deepseek": "density",
    "deepseek-vllm": "density",
    "vllm": "density",
    "auto": "layout",
}
KERNEL_VARIANTS = ("layout", "density", "basic", "layout_alt", "raw", "raster")
ENGINE_CHOICES = sorted(set(ENGINE_TO_VARIANT) | set(KERNEL_VARIANTS))


def to_variant(name: str) -> str:
    v = ENGINE_TO_VARIANT.get(name, name)
    if v not in KERNEL_VARIANTS:
        raise click.ClickException(f"Unknown engine: {name!r}")
    return v


def load_yaml_config(path) -> dict:
    """Reference YAML config keys -> plain dict (``PipelineConfig.
    from_file``, core/config.py:160-205).  Engine-typed keys stay as
    the raw name strings; callers map them through :func:`to_variant`.
    Unknown keys are ignored (forward compatibility), like the
    reference's explicit field allowlist."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    out: dict = {}
    for key in ("primary_engine", "local_engine"):
        if key in data:
            out[key] = str(data[key])
    for key in ("fallback_chain", "enabled_engines", "multi_engine"):
        if key in data:
            out[key] = [str(e) for e in data[key]]
        elif key == "fallback_chain" and "fallback_engine" in data:
            out[key] = [str(data["fallback_engine"])]
    for key in (
        "native_first", "tiered", "max_retries", "truncation_retries",
        "chunk_threshold", "render_dpi", "save_figures",
        "figures_max_total", "figures_max_per_page", "audit_enabled",
        "audit_min_words", "consensus_enabled", "consensus_use_llm",
        "consensus_ollama_model", "reprocess", "dry_run", "quiet",
        "verbose",
    ):
        if key in data:
            out[key] = data[key]
    if "output_dir" in data:
        out["output_dir"] = str(data["output_dir"])
    return out


def common_options(f):
    """Options shared between process and batch (cli.py:31-45)."""
    f = click.option("--primary", type=click.Choice(ENGINE_CHOICES),
                     help="Primary OCR engine")(f)
    f = click.option("--fallback", type=click.Choice(ENGINE_CHOICES),
                     help="Fallback OCR engine")(f)
    f = click.option("--no-audit", is_flag=True,
                     help="Skip quality audit stage")(f)
    f = click.option("--no-native-first", is_flag=True,
                     help="Disable native-first: run extraction on all pages")(f)
    f = click.option("--timeout", type=int, default=1800,
                     help="Subprocess timeout in seconds (accepted for "
                          "compatibility; in-process kernels are bounded "
                          "by deterministic work budgets)")(f)
    f = click.option("--save-figures", is_flag=True,
                     help="Embed figure blocks (metadata + stub captions)")(f)
    f = click.option("--reprocess", is_flag=True,
                     help="Reprocess already-processed files")(f)
    f = click.option("--dry-run", is_flag=True,
                     help="List files without processing")(f)
    f = click.option("-q", "--quiet", is_flag=True,
                     help="Suppress non-error output")(f)
    f = click.option("-v", "--verbose", is_flag=True,
                     help="Enable verbose output")(f)
    f = click.option("--config", "config_path",
                     type=click.Path(exists=True, path_type=Path),
                     help="YAML config file (reference key schema)")(f)
    return f


def _build_options(
    primary=None, fallback=None, no_audit=False, no_native_first=False,
    timeout=1800, save_figures=False, reprocess=False, dry_run=False,
    quiet=False, verbose=False, config_path=None, output_dir=None,
) -> dict:
    opts = {
        "chain": None,
        "native_first": True,
        "audit_enabled": True,
        "save_figures": False,
        "reprocess": False,
        "dry_run": False,
        "quiet": False,
        "multi_engine": [],
        "output_dir": Path(output_dir) if output_dir else Path("./socr_output"),
    }
    if config_path:
        cfg = load_yaml_config(config_path)
        # same policy as the --consensus-llm flag: capabilities that
        # need a backend absent here fail loudly, never degrade silently
        if cfg.get("consensus_use_llm") or cfg.get("consensus_ollama_model"):
            raise click.ClickException(
                "config requests LLM consensus (consensus_use_llm / "
                "consensus_ollama_model), which needs an Ollama backend "
                "not available in this environment; remove the keys to "
                "use deterministic consensus"
            )
        if cfg.get("tiered") or "local_engine" in cfg:
            click.echo(
                "warning: tiered/local_engine routing is a multi-backend "
                "feature; the in-process single-doc harness runs every "
                "variant locally, so these keys have no effect here "
                "(the distributed pipeline routes difficulty natively)",
                err=True,
            )
        if "primary_engine" in cfg or "fallback_chain" in cfg:
            chain = [to_variant(cfg.get("primary_engine", "auto"))]
            for e in cfg.get("fallback_chain", []):
                v = to_variant(e)
                if v not in chain:
                    chain.append(v)
            opts["chain"] = chain
        for src, dst in (
            ("native_first", "native_first"), ("audit_enabled", "audit_enabled"),
            ("save_figures", "save_figures"), ("reprocess", "reprocess"),
            ("dry_run", "dry_run"), ("quiet", "quiet"),
        ):
            if src in cfg:
                opts[dst] = cfg[src]
        if "multi_engine" in cfg:
            opts["multi_engine"] = [to_variant(e) for e in cfg["multi_engine"]]
        if "output_dir" in cfg and not output_dir:
            opts["output_dir"] = Path(cfg["output_dir"])
    if primary:
        chain = [to_variant(primary)]
        if fallback and to_variant(fallback) not in chain:
            chain.append(to_variant(fallback))
        opts["chain"] = chain
    elif fallback:
        # --fallback alone EXTENDS the configured (or default) chain —
        # it must not silently reset the primary engine to auto
        base = opts["chain"] or [to_variant("auto")]
        fb = to_variant(fallback)
        opts["chain"] = base + ([fb] if fb not in base else [])
    if no_audit:
        opts["audit_enabled"] = False
    if no_native_first:
        opts["native_first"] = False
    if save_figures:
        opts["save_figures"] = True
    if reprocess:
        opts["reprocess"] = True
    if dry_run:
        opts["dry_run"] = True
    if quiet:
        opts["quiet"] = True
    return opts


def _process_one(path: Path, opts: dict) -> dict:
    """One document through the per-document control-flow kernel."""
    from types import SimpleNamespace

    from smart_ocr_spark.kernel import assess, orchestrate
    from smart_ocr_spark.kernel.extract import extract_payload_full
    from smart_ocr_spark.kernel.figures import doc_figures
    from smart_ocr_spark.kernel.repair import DEFAULT_CHAIN

    payload = path.read_bytes()
    chain = opts["chain"] or list(DEFAULT_CHAIN)
    parsed = extract_payload_full(payload)
    pdoc = parsed.pop("_pdf_doc", None)
    doc = orchestrate.new_document(str(path), 1)  # doc-grain (SURVEY §1.4)
    r = assess.assess_page(
        parsed["basic_text"],
        font_count=parsed["font_count"],
        has_images=parsed["has_figures"],
        has_tables=parsed["has_tables"],
        has_equations=parsed["has_equations"],
        # the table-aware layout rendering is the born-digital native
        # output (parity with the distributed path, which sets
        # native_text = layout_text — operators/extract.py)
        structured_text=parsed["layout_text"],
    )
    orchestrate.phase_analyze(
        doc,
        {
            "path": str(path),
            "pages": [
                {
                    "page_num": 1,
                    "is_born_digital": r["is_born_digital"],
                    "native_text": r["native_text"],
                    "needs_ocr_enhancement": r["needs_ocr_enhancement"],
                }
            ],
        },
    )
    if opts["save_figures"]:
        doc["figures"] = doc_figures(payload, doc=pdoc)

    config = SimpleNamespace(
        primary_engine=chain[0],
        fallback_chain=chain[1:],
        enabled_engines=chain,
        native_first=opts["native_first"],
        audit_enabled=opts["audit_enabled"],
        save_figures=opts["save_figures"],
        max_retries=2,
        truncation_retries=0,  # deterministic kernels
        chunk_threshold=30,
        render_dpi=200,
        multi_engine=opts["multi_engine"],
        consensus_enabled=bool(opts["multi_engine"]),
    )

    class _Engine:
        def __init__(self, variant):
            self.name = variant

        def is_available(self):
            return True

        def process_pages(self, pdf_path, page_nums, config, dpi=200):
            from smart_ocr_spark.kernel.extract import extract_payload_variant

            text = extract_payload_variant(payload, self.name) or ""
            ok = bool(text.strip())
            return [
                {
                    "page_num": pn, "text": text,
                    "status": "success" if ok else "error",
                    "engine": self.name,
                    "failure_mode": "none" if ok else "empty_output",
                    # an empty output must NOT pre-pass: a passing
                    # best_output would disable the repair ladder
                    "audit_passed": ok, "confidence": 0.0,
                    "escalated_from": "", "processing_time": 0.0,
                }
                for pn in page_nums
            ]

    engines: dict = {}

    def get_engine(v):
        v = str(v)
        if v not in engines:
            engines[v] = _Engine(v)
        return engines[v]

    class _Scoring:
        def __init__(self, chk):
            self.passed = chk["audit_passed"]
            self.primary_failure = chk["primary_failure"]

    class _Scorer:
        def score(self, text, engine="", expected_pages=0):
            from smart_ocr_spark.kernel import audit

            return _Scoring(audit.check(text, expected_pages=expected_pages))

    # image-only PDF with no text layer: route repair to the raster
    # tier — the EXACT rule of operators/extract.scanned_py
    # (total_chars == 0, not a whitespace strip: a whitespace-only text
    # layer counts as content there and must here too)
    scanned_doc = bool(
        parsed.get("is_pdf")
        and (parsed.get("n_images") or 0) > 0
        and (parsed.get("total_chars") or 0) == 0
    )

    class _Router:
        def plan_repairs_doc(self, doc):
            from types import SimpleNamespace as NS

            from smart_ocr_spark.kernel import repair

            repairs, skipped = [], []
            for page_num, ps in sorted(doc["pages"].items()):
                best = ps["best_output"]
                if not repair.page_needs_repair(
                    ps["is_born_digital"], ps["native_text"],
                    ps["needs_ocr_enhancement"], len(ps["attempts"]),
                    None if best is None else best["audit_passed"],
                ):
                    continue
                failure = repair.dominant_failure(
                    [a["failure_mode"] for a in ps["attempts"]]
                )
                tried = {a["engine"] for a in ps["attempts"]}
                picked = repair.select_repair_variant(
                    failure, tried, chain=chain, scanned=scanned_doc
                )
                if picked is None:
                    skipped.append(page_num)
                else:
                    repairs.append(NS(page_num=page_num, engine=picked,
                                      reason=""))
            groups: dict = {}
            for rep in repairs:
                groups.setdefault(rep.engine, []).append(rep)
            return NS(repairs=repairs, pages_skipped=skipped,
                      is_empty=not repairs, by_engine=groups)

    scorer = _Scorer()
    if opts["multi_engine"]:
        results = orchestrate.backbone_multi_engine(
            doc, config, get_engine, dict
        )
        if opts["audit_enabled"]:
            orchestrate.phase_score_multi(doc, config, results, scorer)
        orchestrate.phase_consensus(doc, config, dict)
    else:
        backbone = orchestrate.phase_backbone(
            doc, config, get_engine, scorer, dict, dict
        )
        if backbone and backbone["status"] == "success" and opts["audit_enabled"]:
            orchestrate.phase_score(doc, config, backbone, scorer)
        if opts["audit_enabled"]:
            orchestrate.phase_repair(
                doc, config, get_engine, scorer, _Router(), dict
            )
    from smart_ocr_spark.kernel.normalize import strip_phantom_images

    return orchestrate.phase_assemble(
        doc, config, dict, dict, normalize_fn=strip_phantom_images
    )


def _write_markdown(result: dict, path: Path, out_dir: Path) -> Path | None:
    from smart_ocr_spark.kernel.normalize import sanitize_filename

    text = result["pages"][0]["text"]
    if not text.strip():
        return None
    stem = sanitize_filename(path.stem)
    doc_dir = out_dir / stem
    doc_dir.mkdir(parents=True, exist_ok=True)
    md = doc_dir / f"{stem}.md"
    md.write_text(text)
    return md


@click.group(invoke_without_command=True)
@click.pass_context
def cli(ctx: click.Context) -> None:
    """smart-ocr-spark — reference-compatible document processing.

    Usage:
        socr-spark process paper.pdf [OPTIONS]
        socr-spark batch ./papers/ [OPTIONS]
        socr-spark engines
    """
    if ctx.invoked_subcommand is None:
        click.echo(ctx.get_help())


@cli.command()
@click.argument("pdf_path", type=click.Path(exists=True, path_type=Path))
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              help="Output directory")
@click.option("--unified", is_flag=True,
              help="Use the 5-phase orchestrator (always on here; "
                   "accepted for compatibility)")
@click.option("--multi-engine", "multi_engine_str", type=str, default="",
              help="Comma-separated engines to run (e.g. gemini,mistral)")
@click.option("--consensus-llm", type=str, default="",
              help="Ollama model for LLM consensus (e.g. qwen3.5:4b)")
@common_options
def process(pdf_path, output_dir, unified=False, multi_engine_str="",
            consensus_llm="", **kwargs):
    """Process a single PDF/HTML document (reference cli.py:112-193)."""
    opts = _build_options(output_dir=output_dir, **kwargs)
    if multi_engine_str:
        opts["multi_engine"] = [
            to_variant(e.strip())
            for e in multi_engine_str.split(",") if e.strip()
        ]
    if consensus_llm:
        # honest failure, not silent degradation: no Ollama backend here
        raise click.ClickException(
            "--consensus-llm requires an Ollama backend, which is not "
            "available in this environment; deterministic consensus "
            "(kernel.consensus) runs instead when --multi-engine is given"
        )
    result = _process_one(pdf_path, opts)
    md = _write_markdown(result, pdf_path, opts["output_dir"])
    if not opts["quiet"]:
        click.echo(f"status: {result['status']}  engine: {result['engine']}")
        if md:
            click.echo(f"output: {md}")


@cli.command()
@click.argument("input_dir", type=click.Path(exists=True, path_type=Path))
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              help="Output directory")
@click.option("--limit", type=int, help="Maximum number of files to process")
@click.option("--unified", is_flag=True, help="Accepted for compatibility")
@click.option("--multi-engine", "multi_engine_str", type=str, default="",
              help="Comma-separated engines (e.g. gemini,mistral)")
@common_options
def batch(input_dir, output_dir, limit=None, unified=False,
          multi_engine_str="", **kwargs):
    """Process a directory sequentially with the reference's skip-filter
    semantics (orchestrator.py:144-203).  For corpus-scale runs use the
    checkpointed Spark job (jobs/extract.py)."""
    opts = _build_options(output_dir=output_dir, **kwargs)
    if multi_engine_str:
        opts["multi_engine"] = [
            to_variant(e.strip())
            for e in multi_engine_str.split(",") if e.strip()
        ]
    files = sorted(
        p for p in Path(input_dir).iterdir()
        if p.suffix.lower() in (".pdf", ".html", ".htm")
    )
    if limit:
        files = files[:limit]
    meta_path = opts["output_dir"] / "metadata.json"
    meta = {}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    todo = [
        p for p in files
        if opts["reprocess"] or str(p) not in meta
    ]
    if opts["dry_run"]:
        for p in todo:
            click.echo(str(p))
        return
    for p in todo:
        result = _process_one(p, opts)
        _write_markdown(result, p, opts["output_dir"])
        if result["status"] in ("success", "success_native"):
            meta[str(p)] = {"engine": result["engine"],
                            "status": result["status"]}
            opts["output_dir"].mkdir(parents=True, exist_ok=True)
            meta_path.write_text(json.dumps(meta, indent=1))
        if not opts["quiet"]:
            click.echo(f"{p.name}: {result['status']}")


@cli.command()
def engines() -> None:
    """List the kernel variants standing in for the reference engines."""
    from smart_ocr_spark.operators.extract import VARIANT_COST_MICROUSD

    for variant in KERNEL_VARIANTS:
        aliases = sorted(
            k for k, v in ENGINE_TO_VARIANT.items() if v == variant
        )
        cost = VARIANT_COST_MICROUSD.get(variant, 0)
        click.echo(
            f"{variant:<12} available  cost={cost}uUSD/page  "
            f"aliases={','.join(aliases) or '-'}"
        )


if __name__ == "__main__":
    cli()

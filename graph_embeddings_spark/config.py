"""Pipeline configuration — a faithful Python mirror of the reference's YAML schema.

Reference: util/config/Configuration.java:17-501 (field-for-field), loaded via
SnakeYAML in util/read/ConfigReader.java:15-21. We load the identical YAML shape
with yaml.safe_load into frozen dataclasses and validate like Configuration.check
(Configuration.java:478-494).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Node type tags — NodeInfo.java:8-34 encoding.
URI, BLANK, LITERAL, PREDICATE = 0, 1, 2, 3

GLOVE, PGLOVE = "glove", "pglove"
ADAGRAD, ADAM, AMSGRAD = "adagrad", "adam", "amsgrad"
NORM_NONE, NORM_UNITY, NORM_COUNTS = "none", "unity", "counts"


@dataclass(frozen=True)
class SimilarityGroup:
    """One similarity-matching group — Configuration.java:182-318.

    source/target are predicate URIs whose literal objects get compared with
    `method`; pairs scoring >= threshold become bidirectional type-0 edges.
    """

    source_predicate: str
    target_predicate: str
    method: str = "token_jaccard"  # Configuration.java:27-29 enum
    threshold: float = 0.5
    ngram: int = 3  # Configuration.java:307-309 default
    threshold_distance: float = 0.0  # 'distance' for numeric/date
    smooth: float = 0.5  # 'alpha'/'smooth' exponent parameter
    pattern: str = "iso"  # date pattern; 'iso' -> BASIC_ISO_DATE (Date.java:24)
    time: str = "bidirectional"  # bidirectional | backwards | forwards (Date.java:52-59)


@dataclass(frozen=True)
class BcaConfig:
    """Configuration.java:320-363."""

    alpha: float = 1e-1
    epsilon: float = 1e-3
    directed: bool = False
    normalize: str = NORM_NONE  # none | unity | counts


@dataclass(frozen=True)
class OptConfig:
    """Configuration.java:365-398."""

    method: str = ADAGRAD
    tolerance: float = 1e-5
    maxiter: int = 50


@dataclass(frozen=True)
class OutputConfig:
    """Output filters — Configuration.java:413-476; applied in
    util/write/EmbeddingTextWriter.java:34-37,100-131."""

    name: str = "embedding"
    uri: list[str] | None = None  # prefix filters; None group disabled, [] = all
    blank: list[str] | None = None
    literal: list[str] | None = None
    predicate: list[str] | None = None

    def enabled_types(self) -> list[int]:
        out = []
        if self.uri is not None:
            out.append(URI)
        if self.blank is not None:
            out.append(BLANK)
        if self.literal is not None:
            out.append(LITERAL)
        if self.predicate is not None:
            out.append(PREDICATE)
        return out


@dataclass(frozen=True)
class PcaConfig:
    """pca.variance (Configuration.java pca block): minimum cumulative
    explained-variance ratio; declared by every shipped reference config
    but left TODO upstream (Main.java:43-44) — implemented here
    (glove/pca.py)."""

    variance: float = 0.95


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level config — Configuration.java:17-501."""

    graph: str = ""
    method: str = GLOVE  # glove | pglove (Configuration.java:19-21)
    dim: int = 32
    threads: int = 8
    seed: int = 42  # reference defaults to wall-clock (Configuration.java:157-159); we fix it
    weights: dict[str, float] = field(default_factory=dict)
    similarity: list[SimilarityGroup] = field(default_factory=list)
    bca: BcaConfig = field(default_factory=BcaConfig)
    opt: OptConfig = field(default_factory=OptConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    pca: PcaConfig | None = None  # None = no PCA (usingPca() analog)

    def check(self) -> None:
        """Configuration.check — Configuration.java:478-494."""
        if self.dim <= 0:
            raise ValueError("dim must be positive")
        if self.method not in (GLOVE, PGLOVE):
            raise ValueError(f"unknown method {self.method}")
        if self.bca.alpha <= 0 or self.bca.epsilon <= 0:
            raise ValueError("bca alpha/epsilon must be positive")
        if self.opt.method not in (ADAGRAD, ADAM, AMSGRAD):
            raise ValueError(f"unknown optimizer {self.opt.method}")
        if self.method == PGLOVE and self.bca.normalize == NORM_COUNTS:
            # the logit link consumes probabilities. BCA paint (none) and
            # unity normalization live in (0,1] — fine — but counts
            # normalization maps to [1,1000] (BCV.java:89-91), entirely
            # outside the pglove domain: reject at load time instead of
            # failing the kernel's domain guard mid-job
            raise ValueError("method pglove cannot use bca.normalize: counts")
        if not self.output.enabled_types():
            raise ValueError("at least one output group must be enabled")
        for g in self.similarity or ():
            # a group without a predicate can never match anything — reject
            # at load time like the reference's bean binding would
            if not g.source_predicate or not g.target_predicate:
                raise ValueError(
                    "similarity group needs sourcePredicate/predicate "
                    f"(got source={g.source_predicate!r} target={g.target_predicate!r})"
                )


def load_config(path: str) -> PipelineConfig:
    """YAML -> PipelineConfig (ConfigReader.java:15-21 analog)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    # The reference's SHIPPED configs (dblp.config.yml etc.) predate its
    # current schema: they say `predicate:` (no setPredicate exists in
    # Configuration.java — SnakeYAML bean binding rejects it) and
    # `method: token` (no TOKEN in SimilarityMethod). We accept both
    # spellings so a reference user's YAML runs verbatim.
    _method_alias = {"token": "token_jaccard", "ngram": "ngram_jaccard"}

    def _src(g):
        return g.get("sourcePredicate", g.get("predicate"))

    sim = [
        SimilarityGroup(
            source_predicate=_src(g),
            target_predicate=g.get("targetPredicate", _src(g)),
            method=_method_alias.get(
                (m := g.get("method", "token_jaccard").lower().replace("-", "_")), m
            ),
            threshold=float(g.get("threshold", 0.5)),
            ngram=int(g.get("ngram", 3)),
            threshold_distance=float(g.get("distance", 0.0)),
            smooth=float(g.get("smooth", g.get("alpha", 0.5))),
            pattern=g.get("pattern", "iso"),
            time=g.get("time", "bidirectional").lower(),
        )
        for g in raw.get("similarity", []) or []
    ]
    # a declared `pca:` block ENABLES the reduction even when empty/null
    # (`pca:` / `pca: {}`); variance falls back to PcaConfig's default —
    # pca_raw["variance"] would KeyError and `or None` silently disabled it.
    # Explicit opt-outs stay opt-outs: a falsy scalar (`pca: false`,
    # `pca: 0`) or a falsy non-null `enabled:` inside the block
    # (`enabled: false`, `enabled: 0` — same falsy convention both
    # spellings) disables; any other scalar (e.g. `pca: true`) or
    # mapping/null enables.
    pca_val = raw.get("pca")
    pca_enabled = "pca" in raw and not (
        (pca_val is not None and not isinstance(pca_val, dict) and not pca_val)
        or (
            isinstance(pca_val, dict)
            and "enabled" in pca_val
            and pca_val["enabled"] is not None
            and not pca_val["enabled"]
        )
    )
    pca_raw = pca_val if isinstance(pca_val, dict) else {}
    bca_raw = raw.get("bca", {}) or {}
    opt_raw = raw.get("opt", {}) or {}
    out_raw = raw.get("output", {}) or {}
    cfg = PipelineConfig(
        graph=raw.get("graph", ""),
        method=(raw.get("method", GLOVE) or GLOVE).lower(),
        dim=int(raw.get("dim", 32)),
        threads=int(raw.get("threads", 8)),
        seed=int(raw.get("seed", 42)),
        weights={str(k): float(v) for k, v in (raw.get("weights", {}) or {}).items()},
        similarity=sim,
        bca=BcaConfig(
            alpha=float(bca_raw.get("alpha", 1e-1)),
            epsilon=float(bca_raw.get("epsilon", 1e-3)),
            directed=bool(bca_raw.get("directed", False)),
            normalize=(bca_raw.get("normalize", NORM_NONE) or NORM_NONE).lower(),
        ),
        opt=OptConfig(
            method=(opt_raw.get("method", ADAGRAD) or ADAGRAD).lower(),
            tolerance=float(opt_raw.get("tolerance", 1e-5)),
            maxiter=int(opt_raw.get("maxiter", 50)),
        ),
        output=OutputConfig(
            name=out_raw.get("name", "embedding"),
            uri=out_raw.get("uri"),
            blank=out_raw.get("blank"),
            literal=out_raw.get("literal"),
            predicate=out_raw.get("predicate"),
        ),
        pca=PcaConfig(variance=float(pca_raw.get("variance", PcaConfig.variance)))
        if pca_enabled else None,
    )
    cfg.check()
    return cfg

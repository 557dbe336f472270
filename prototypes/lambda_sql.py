"""Develop the DuckDB SQL replica of the lambda pipeline; sanity-check
against a local numpy implementation of the exact same math."""
import duckdb, numpy as np

SF = "/root/testdata/sf0.01"
EPS, K, P, SIGMA = 0.99, 10, 2.0, 0.495
TAU = 0.62
QIDS = (3, 7, 11)
TOPK = 10

con = duckdb.connect()
con.execute(f"create view embeddings as select * from '{SF}/embeddings.parquet'")

COS = "(list_dot_product({a},{b}) / (sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))))"

sql = f"""
WITH emb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
cand AS (
  SELECT a.id AS src, b.id AS dst, 1.0 - greatest({COS.format(a='a.e', b='b.e')}, 0.0) AS dist
  FROM emb a, emb b WHERE a.id <> b.id),
inball AS (SELECT * FROM cand WHERE dist <= {EPS}),
knn AS (SELECT src, dst, dist,
        row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn FROM inball),
kept AS (SELECT src, dst, dist FROM knn WHERE rn <= {K}),
canon AS (SELECT least(src,dst) AS src, greatest(src,dst) AS dst, min(dist) AS dist
          FROM kept GROUP BY 1,2),
edges AS (SELECT src, dst, dist, 1.0/(1.0+pow(dist/{SIGMA},{P})) AS weight FROM canon),
bothdir AS (SELECT src, dst, weight FROM edges UNION ALL SELECT dst, src, weight FROM edges),
deg AS (SELECT src AS id, sum(weight) AS d FROM bothdir GROUP BY 1),
feats AS (SELECT id, unnest(e) AS v, generate_subscripts(e,1) AS fi FROM emb),
-- L_F = sum_i deg_i x_i x_i^T - sum_(i,j) w_ij x_i x_j^T  (both orientations)
lf_diag AS (
  SELECT a.fi AS fi, b.fi AS fj, sum(d.d * a.v * b.v) AS val
  FROM feats a JOIN feats b USING (id) JOIN deg d ON d.id = a.id
  GROUP BY 1,2),
lf_edge AS (
  SELECT a.fi AS fi, b.fi AS fj, sum(-e.weight * a.v * b.v) AS val
  FROM bothdir e JOIN feats a ON a.id = e.src JOIN feats b ON b.id = e.dst
  GROUP BY 1,2),
lf AS (
  SELECT fi, fj, sum(val) AS lv FROM (
    SELECT * FROM lf_diag UNION ALL SELECT * FROM lf_edge) GROUP BY 1,2),
-- queries: perturbed corpus vectors
q AS (SELECT id AS qid, list_transform(e, x -> x * 1.05) AS e FROM emb WHERE id IN {QIDS}),
qfeats AS (SELECT qid AS id, unnest(e) AS v, generate_subscripts(e,1) AS fi FROM q),
-- e_raw = x^T L_F x  for items and queries
allfeats AS (
  SELECT 'i' AS kind, id, v, fi FROM feats
  UNION ALL SELECT 'q' AS kind, id, v, fi FROM qfeats),
eraw AS (
  SELECT f1.kind, f1.id, sum(f1.v * l.lv * f2.v) AS e_raw
  FROM allfeats f1
  JOIN lf l ON l.fi = f1.fi
  JOIN allfeats f2 ON f2.kind = f1.kind AND f2.id = f1.id AND f2.fi = l.fj
  GROUP BY 1,2),
-- dispersion g over feature-graph edges w_f = max(0, -L_F), fi<>fj (both orientations)
fedges AS (SELECT fi, fj, -lv AS w FROM lf WHERE fi <> fj AND -lv > 0),
gshare AS (
  SELECT f1.kind, f1.id,
         sum(fe.w * (f1.v - f2.v) * (f1.v - f2.v)) AS tot,
         sum(pow(fe.w * (f1.v - f2.v) * (f1.v - f2.v), 2)) AS sumsq
  FROM fedges fe
  JOIN allfeats f1 ON f1.fi = fe.fi
  JOIN allfeats f2 ON f2.kind = f1.kind AND f2.id = f1.id AND f2.fi = fe.fj
  GROUP BY 1,2),
lam AS (
  SELECT e.kind, e.id,
         {TAU} * (e.e_raw / (e.e_raw + {TAU}))
         + (1 - {TAU}) * least(greatest(CASE WHEN g.tot > 0 THEN g.sumsq/(g.tot*g.tot) ELSE 0 END, 0.0), 1.0) AS lam
  FROM eraw e JOIN gshare g ON g.kind = e.kind AND g.id = e.id),
scored AS (
  SELECT q.qid AS query_id, c.id AS item_id,
         {TAU} * {COS.format(a='q.e', b='c.e')}
         + (1 - {TAU}) * (1.0 / (1.0 + abs(lq.lam - lx.lam))) AS score
  FROM q JOIN lam lq ON lq.kind = 'q' AND lq.id = q.qid
  CROSS JOIN emb c
  JOIN lam lx ON lx.kind = 'i' AND lx.id = c.id),
ranked AS (
  SELECT query_id, item_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, item_id ASC) AS rank
  FROM scored)
SELECT query_id, item_id, CAST(rank AS BIGINT) AS rank, round(score,5) AS score_r
FROM ranked WHERE rank <= {TOPK} ORDER BY query_id, rank
"""
import time
t0=time.time()
res = con.execute(sql).df()
print("sql took", round(time.time()-t0,1), "s; rows", len(res))

# --- numpy ground truth of the same math ---
emb = con.execute("SELECT vec_id, embedding::DOUBLE[] e FROM embeddings ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in emb]); X = np.array([r[1] for r in emb])
n = len(X)
norms = np.linalg.norm(X, axis=1)
cos = (X @ X.T) / np.outer(norms, norms)
dist = 1 - np.maximum(cos, 0); np.fill_diagonal(dist, np.inf)
W = np.zeros((n,n))
for i in range(n):
    cand = np.nonzero(dist[i] <= EPS)[0]
    order = np.lexsort((ids[cand], dist[i][cand]))[:K]
    for j in cand[order]:
        w = 1/(1+(dist[i,j]/SIGMA)**P)
        W[i,j] = w
W = np.maximum(W, W.T)  # symmetrize (edge survives either direction)
L = np.diag(W.sum(1)) - W
LF = X.T @ L @ X
def lam_of(x):
    e = x @ LF @ x
    eb = e/(e+TAU)
    Wp = np.maximum(-LF, 0); np.fill_diagonal(Wp, 0)
    ii, jj = np.nonzero(Wp)
    c = Wp[ii,jj]*(x[ii]-x[jj])**2
    tot = c.sum(); g = (c**2).sum()/tot**2 if tot>0 else 0
    return TAU*eb + (1-TAU)*min(max(g,0),1)
lams = np.array([lam_of(x) for x in X])
for qid in QIDS:
    qv = X[qid]*1.05
    lq = lam_of(qv)
    qc = (X @ qv)/(norms*np.linalg.norm(qv))
    sc = TAU*qc + (1-TAU)/(1+np.abs(lq-lams))
    order = np.lexsort((ids, -sc))[:TOPK]
    sql_rows = res[res.query_id==qid]
    match = list(ids[order]) == list(sql_rows.item_id)
    sc_match = np.allclose(np.round(sc[order],5), sql_rows.score_r, atol=1e-9)
    print(f"q{qid}: ranking match={match} score match={sc_match}")
    if not match:
        print("  np:", list(ids[order])[:10], "sql:", list(sql_rows.item_id)[:10])

"""Prototype: pin the lambda (synthetic tau index) math against test_0 goldens.

Golden (reference tests/test_0.py): query = items[2]*1.05
  tau=1.0  -> [2,1,4]
  tau=0.9  -> [1,2,0]
  tau=0.6  -> [1,3,2]
  tau=0.55 -> [1,3,2]
"""
import numpy as np
import itertools

items = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]],
dtype=np.float64)
EPS, K, TOPK, P, SIGMA = 0.05, 5, 3, 2.0, 0.05
GOLD = {1.0:[2,1,4], 0.9:[1,2,0], 0.6:[1,3,2], 0.55:[1,3,2]}
q = items[2]*1.05

def cos_mat(X, Y):
    Xn = X/np.linalg.norm(X,axis=1,keepdims=True)
    Yn = Y/np.linalg.norm(Y,axis=1,keepdims=True)
    return Xn@Yn.T

def knn_laplacian(X, eps, k, p, sigma, normalise=True):
    """lambda-tau graph: rectified cosine dist, eps filter, per-node k smallest, symmetrize, kernel weights, L=D-W."""
    n = len(X)
    C = cos_mat(X, X)
    D_ = 1.0 - np.maximum(C, 0.0)
    np.fill_diagonal(D_, np.inf)
    W = np.zeros((n,n))
    for i in range(n):
        cand = [j for j in range(n) if D_[i,j] <= eps]
        cand.sort(key=lambda j: D_[i,j])
        for j in cand[:k]:
            w = 1.0/(1.0+(D_[i,j]/sigma)**p)
            W[i,j] = max(W[i,j], w); W[j,i] = W[i,j]
    L = np.diag(W.sum(1)) - W
    return W, L

def synth_index(x, L, tau):
    xx = float(x@x)
    e_raw = float(x@L@x)/xx
    e_b = e_raw/(e_raw+tau)
    Wf = np.maximum(-L, 0.0); np.fill_diagonal(Wf, 0.0)
    diffs = (x[:,None]-x[None,:])**2
    contrib = Wf*diffs
    tot = contrib.sum()
    g_raw = ((contrib/tot)**2).sum() if tot > 0 else 0.0
    g = min(max(g_raw,0.0),1.0)
    return tau*e_b + (1.0-tau)*g

def try_config(name, LF, tau_mode_items):
    e_raws = []
    for x in tau_mode_items:
        xx = float(x@x)
        e_raws.append(float(x@LF@x)/xx)
    tau_synth = float(np.median(e_raws))
    lambdas = np.array([synth_index(x, LF, tau_synth) for x in items])
    lam_q = synth_index(q, LF, tau_synth)
    cosq = cos_mat(q[None,:], items)[0]
    ok = True
    res = {}
    for tau, gold in GOLD.items():
        score = tau*cosq + (1-tau)*(1.0/(1.0+np.abs(lam_q-lambdas)))
        order = list(np.argsort(-score)[:TOPK])
        res[tau] = order
        if order != gold: ok = False
    print(f"{name}: tau_synth={tau_synth:.4f} lambdas={np.round(lambdas,4)} lam_q={lam_q:.4f} {'MATCH' if ok else 'no'} {res}")
    return ok

# item graph
for normalise in [True, False]:
    W, L = knn_laplacian(items, EPS, K, P, SIGMA, normalise)
    X = items
    # candidate A: L_F = X^T L X  (features as signals over item graph)
    LF_A = X.T@L@X
    try_config(f"A XtLX norm={normalise}", LF_A, items)
    # candidate A2: normalized rows first
    Xn = X/np.linalg.norm(X,axis=1,keepdims=True)
    LF_A2 = Xn.T@L@Xn
    try_config(f"A2 XnTLXn norm={normalise}", LF_A2, items)
    # candidate B: same knn pipeline on transposed matrix (features as points)
    WB, LF_B = knn_laplacian(X.T, EPS, 6, P, SIGMA)
    try_config(f"B knn(X.T) norm={normalise}", LF_B, items)
    # candidate B2: k = F
    WB2, LF_B2 = knn_laplacian(X.T, EPS, 24, P, SIGMA)
    try_config(f"B2 knn(X.T,k=F) norm={normalise}", LF_B2, items)

import numpy as np, itertools
items = np.array([
[0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29],
[0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30],
[0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31],
[0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27],
[0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32]], dtype=np.float64)
EPS,K,TOPK,P,SIGMA = 0.05,5,3,2.0,0.05
GOLD = {1.0:[2,1,4],0.9:[1,2,0],0.6:[1,3,2],0.55:[1,3,2]}
q = items[2]*1.05

def cos_mat(X,Y):
    Xn=X/np.linalg.norm(X,axis=1,keepdims=True); Yn=Y/np.linalg.norm(Y,axis=1,keepdims=True)
    return Xn@Yn.T

def knn_laplacian(X,eps,k,p,sigma):
    n=len(X); C=cos_mat(X,X); D_=1.0-np.maximum(C,0.0); np.fill_diagonal(D_,np.inf)
    W=np.zeros((n,n))
    for i in range(n):
        cand=[j for j in range(n) if D_[i,j]<=eps]; cand.sort(key=lambda j:D_[i,j])
        for j in cand[:k]:
            w=1.0/(1.0+(D_[i,j]/sigma)**p); W[i,j]=max(W[i,j],w); W[j,i]=W[i,j]
    return W, np.diag(W.sum(1))-W

def eraw(x,L,div):
    v=float(x@L@x)
    return v/float(x@x) if div else v

def graw(x,L):
    Wf=np.maximum(-L,0.0); np.fill_diagonal(Wf,0.0)
    diffs=(x[:,None]-x[None,:])**2; c=Wf*diffs; tot=c.sum()
    return float(((c/tot)**2).sum()) if tot>0 else 0.0

def S(x,L,tau,div):
    e=eraw(x,L,div); eb=e/(e+tau) if (e+tau)!=0 else 0.0
    g=min(max(graw(x,L),0.0),1.0)
    return tau*eb+(1.0-tau)*g

Wi,Li = knn_laplacian(items,EPS,K,P,SIGMA)
X=items; Xn=X/np.linalg.norm(X,axis=1,keepdims=True)
cands = {
 'XtLX': X.T@Li@X, 'XnTLXn': Xn.T@Li@Xn,
 'knnT6': knn_laplacian(X.T,EPS,6,P,SIGMA)[1],
 'knnTF': knn_laplacian(X.T,EPS,24,P,SIGMA)[1],
 'knnTn6': knn_laplacian(Xn.T,EPS,6,P,SIGMA)[1],
}
cosq = cos_mat(q[None,:],items)[0]
nmatch=0
for lname,LF in cands.items():
  for div in [True,False]:
    for item_tau_mode in ['median','search']:
      for q_tau_mode in ['median','search']:
        e_raws=[eraw(x,LF,div) for x in items]; med=float(np.median(e_raws))
        if med<=0: continue
        ok=True; res={}
        for tau,gold in GOLD.items():
            it_tau = med if item_tau_mode=='median' else tau
            qt = med if q_tau_mode=='median' else tau
            lams=np.array([S(x,LF,it_tau,div) for x in items])
            lq=S(q,LF,qt,div)
            sc=tau*cosq+(1-tau)*(1.0/(1.0+np.abs(lq-lams)))
            order=list(np.argsort(-sc)[:TOPK]); res[tau]=order
            if order!=gold: ok=False
        if ok:
            nmatch+=1
            print("MATCH:",lname,"div=",div,"item_tau=",item_tau_mode,"q_tau=",q_tau_mode)
        elif res[0.9][0]==1:
            print("partial(0.9 starts w/1):",lname,div,item_tau_mode,q_tau_mode,res)
print("total matches:",nmatch)

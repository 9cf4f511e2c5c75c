#!/usr/bin/env python3
"""Generate golden test fixtures by evaluating the reference's CasADi-generated
C kernels (compiled in a temp dir straight from /root/reference, never copied
into this repo) and dumping input/output pairs to tests/fixtures/*.npz.

The kernels follow the standard CasADi C ABI:
    int f(const double** arg, double** res, long long* iw, double* w, int mem)
    const long long* f_sparsity_in(i) / f_sparsity_out(i)   (CCS sparsity)
    int f_work(long long* sz_arg, *sz_res, *sz_iw, *sz_w)

Fixtures produced (all float64):
  hkd_dynamics.npz      x[N,24], u[N,24], dt[N], ctact[N,4] -> xnext[N,24], A[N,24,24], B[N,24,24]
  hkd_footpos.npz       pos,eul,qleg,leg -> pf[N,3], J[N,3,18]
  srb_dynamics.npz      x[N,12], u[N,12], pf[N,12], ctact[N,4] -> xdot[N,12], Ac, Bc
  wb_kin_derivs.npz     q[N,18], v[N,18], qdd[N,18], F[N,12] -> dvdq[N,4,3,18], dadq, dadv, dJTFdq[N,4,18,18]
"""
import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

HKD_SRC = [
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/hkinodyn_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/hkinodyn_par_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/comp_foot_pos_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/comp_foot_jacob_1_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/comp_foot_jacob_2_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/comp_foot_jacob_3_casadi.cpp",
    f"{REF}/HKDMPC/HKD-TrajOpt/CasadiGen/source/comp_foot_jacob_4_casadi.cpp",
]
MHPC_SRC = [
    f"{REF}/MHPC/MHPC-Trajopt/CasadiGen/source/SRBDynamics.cpp",
    f"{REF}/MHPC/MHPC-Trajopt/CasadiGen/source/MCKinematicsDerivativs.cpp",
]


def build_lib(sources, name):
    tmp = tempfile.mkdtemp(prefix="golden_")
    so = os.path.join(tmp, f"lib{name}.so")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", so] + sources
    subprocess.run(cmd, check=True)
    return ctypes.CDLL(so)


class CasadiFn:
    """Dense-in/dense-out evaluator for a CasADi C function."""

    def __init__(self, lib, name):
        self.fn = getattr(lib, name)
        self.fn.restype = ctypes.c_int
        n_in = getattr(lib, name + "_n_in")
        n_in.restype = ctypes.c_longlong
        n_out = getattr(lib, name + "_n_out")
        n_out.restype = ctypes.c_longlong
        self.n_in = int(n_in())
        self.n_out = int(n_out())
        sp_in = getattr(lib, name + "_sparsity_in")
        sp_in.restype = ctypes.POINTER(ctypes.c_longlong)
        sp_out = getattr(lib, name + "_sparsity_out")
        sp_out.restype = ctypes.POINTER(ctypes.c_longlong)
        self.sp_in = [self._read_sparsity(sp_in(i)) for i in range(self.n_in)]
        self.sp_out = [self._read_sparsity(sp_out(i)) for i in range(self.n_out)]
        work = getattr(lib, name + "_work")
        work.restype = ctypes.c_int
        sz = (ctypes.c_longlong * 4)()
        work(ctypes.byref(sz, 0), ctypes.byref(sz, 8), ctypes.byref(sz, 16),
             ctypes.byref(sz, 24))
        self.sz_arg, self.sz_res, self.sz_iw, self.sz_w = [int(s) for s in sz]

    @staticmethod
    def _read_sparsity(ptr):
        nrow, ncol = ptr[0], ptr[1]
        # dense flag: ptr[2] == 1 means dense (colind omitted)
        if ptr[2] == 1:
            return dict(shape=(int(nrow), int(ncol)), dense=True,
                        colind=None, row=None, nnz=int(nrow * ncol))
        colind = [ptr[2 + j] for j in range(ncol + 1)]
        nnz = colind[-1]
        row = [ptr[2 + ncol + 1 + k] for k in range(nnz)]
        return dict(shape=(int(nrow), int(ncol)), dense=False,
                    colind=colind, row=row, nnz=int(nnz))

    def __call__(self, *inputs):
        assert len(inputs) == self.n_in
        arg = (ctypes.POINTER(ctypes.c_double) * max(self.sz_arg, 1))()
        res = (ctypes.POINTER(ctypes.c_double) * max(self.sz_res, 1))()
        iw = (ctypes.c_longlong * max(self.sz_iw, 1))()
        w = (ctypes.c_double * max(self.sz_w, 1))()
        bufs_in = []
        for i, x in enumerate(inputs):
            a = np.ascontiguousarray(np.asarray(x, dtype=np.float64).ravel(order="F"))
            bufs_in.append(a)
            arg[i] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        bufs_out = []
        for i, sp in enumerate(self.sp_out):
            b = np.zeros(sp["nnz"], dtype=np.float64)
            bufs_out.append(b)
            res[i] = b.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        rc = self.fn(arg, res, iw, w, 0)
        assert rc == 0
        outs = []
        for b, sp in zip(bufs_out, self.sp_out):
            nrow, ncol = sp["shape"]
            dense = np.zeros((nrow, ncol), dtype=np.float64)
            if sp["dense"]:
                dense = b.reshape((nrow, ncol), order="F")
            else:
                k = 0
                for j in range(ncol):
                    for t in range(sp["colind"][j], sp["colind"][j + 1]):
                        dense[sp["row"][t], j] = b[k]
                        k += 1
            outs.append(dense)
        return outs


def gen_hkd(lib, rng, N=64):
    dyn = CasadiFn(lib, "hkinodyn")
    par = CasadiFn(lib, "hkinodyn_par")
    x = rng.uniform(-1, 1, (N, 24))
    x[:, 5] += 1.0  # keep height positive-ish
    u = rng.uniform(-20, 20, (N, 24))
    dt = np.full((N,), 0.01)
    ctact = (rng.uniform(0, 1, (N, 4)) > 0.5).astype(np.float64)
    xn = np.zeros((N, 24))
    A = np.zeros((N, 24, 24))
    B = np.zeros((N, 24, 24))
    for i in range(N):
        (xn[i][:, None],) = [np.asarray(o) for o in
                             [dyn(x[i], u[i], dt[i:i + 1], ctact[i])[0]]]
        A[i], B[i] = par(x[i], u[i], dt[i:i + 1], ctact[i])
    np.savez(os.path.join(OUT, "hkd_dynamics.npz"),
             x=x, u=u, dt=dt, ctact=ctact, xnext=xn, A=A, B=B)

    fpos = CasadiFn(lib, "compute_foot_position")
    jacs = [CasadiFn(lib, f"comp_foot_jacob_{l}") for l in (1, 2, 3, 4)]
    pos = rng.uniform(-1, 1, (N, 3))
    eul = rng.uniform(-0.6, 0.6, (N, 3))
    qleg = rng.uniform(-1.5, 1.5, (N, 3))
    leg = rng.integers(0, 4, N)
    pf = np.zeros((N, 3))
    J = np.zeros((N, 3, 18))
    for i in range(N):
        pf[i] = fpos(pos[i], eul[i], qleg[i],
                     np.array([leg[i] + 1.0]))[0].ravel()
        J[i] = jacs[leg[i]](pos[i], eul[i], qleg[i])[0]
    np.savez(os.path.join(OUT, "hkd_footpos.npz"),
             pos=pos, eul=eul, qleg=qleg, leg=leg, pf=pf, J=J)
    print("hkd fixtures done")


def gen_mhpc(lib, rng, N=64):
    srb = CasadiFn(lib, "SRBDynamics")
    srbd = CasadiFn(lib, "SRBDynamicsDerivatives")
    x = rng.uniform(-1, 1, (N, 12))
    x[:, 2] += 1.0
    u = rng.uniform(-30, 30, (N, 12))
    pf = rng.uniform(-1, 1, (N, 12))
    ctact = (rng.uniform(0, 1, (N, 4)) > 0.5).astype(np.float64)
    xdot = np.zeros((N, 12))
    Ac = np.zeros((N, 12, 12))
    Bc = np.zeros((N, 12, 12))
    for i in range(N):
        xdot[i] = srb(x[i], u[i], pf[i], ctact[i])[0].ravel()
        Ac[i], Bc[i] = srbd(x[i], u[i], pf[i], ctact[i])
    np.savez(os.path.join(OUT, "srb_dynamics.npz"),
             x=x, u=u, pf=pf, ctact=ctact, xdot=xdot, Ac=Ac, Bc=Bc)

    fvel = CasadiFn(lib, "footVelPartialDq")
    facc_q = CasadiFn(lib, "footAccPartialDq")
    facc_v = CasadiFn(lib, "footAccPartialDv")
    fforce = CasadiFn(lib, "footForcePartialDq")
    q = rng.uniform(-0.8, 0.8, (N, 18))
    q[:, 2] += 0.8
    v = rng.uniform(-1, 1, (N, 18))
    qdd = rng.uniform(-5, 5, (N, 18))
    F = rng.uniform(-20, 20, (N, 12))
    dvdq = np.zeros((N, 4, 3, 18))
    dadq = np.zeros((N, 4, 3, 18))
    dadv = np.zeros((N, 4, 3, 18))
    dJTFdq = np.zeros((N, 4, 18, 18))
    for i in range(N):
        o = fvel(q[i], v[i])
        for l in range(4):
            dvdq[i, l] = o[l]
        o = facc_q(q[i], v[i], qdd[i])
        for l in range(4):
            dadq[i, l] = o[l]
        o = facc_v(q[i], v[i], qdd[i])
        for l in range(4):
            dadv[i, l] = o[l]
        o = fforce(q[i], F[i])
        for l in range(4):
            dJTFdq[i, l] = o[l]
    np.savez(os.path.join(OUT, "wb_kin_derivs.npz"),
             q=q, v=v, qdd=qdd, F=F, dvdq=dvdq, dadq=dadq, dadv=dadv,
             dJTFdq=dJTFdq)
    print("mhpc fixtures done")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)
    lib_hkd = build_lib(HKD_SRC, "hkd")
    gen_hkd(lib_hkd, rng)
    lib_mhpc = build_lib(MHPC_SRC, "mhpc")
    gen_mhpc(lib_mhpc, rng)
    print("all fixtures written to", OUT)


if __name__ == "__main__":
    sys.exit(main())

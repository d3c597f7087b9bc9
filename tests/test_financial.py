"""financialFoam: Black-Scholes on a 1-D stock-price mesh
(reference: applications/solvers/financial/financialFoam/)."""

import math
import os

import numpy as np

HDR = 'FoamFile { version 2.0; format ascii; class %s; object %s; }\n'


def _bs_call(S, K, r, sigma, tau):
    if tau <= 0:
        return max(S - K, 0.0)
    d1 = (math.log(S / K) + (r + 0.5 * sigma ** 2) * tau) \
        / (sigma * math.sqrt(tau))
    d2 = d1 - sigma * math.sqrt(tau)
    N = lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2)))
    return S * N(d1) - K * math.exp(-r * tau) * N(d2)


def test_black_scholes_european_call(tmp_path):
    K, r, sigma, tau = 50.0, 0.05, 0.2, 0.5
    case = str(tmp_path / "fin")
    os.makedirs(case + "/system", exist_ok=True)
    os.makedirs(case + "/0", exist_ok=True)
    os.makedirs(case + "/constant", exist_ok=True)
    with open(case + "/system/blockMeshDict", "w") as f:
        f.write(HDR % ("dictionary", "blockMeshDict") + """
convertToMeters 1;
vertices ( (1 0 0) (150 0 0) (150 1 0) (1 1 0)
           (1 0 1) (150 0 1) (150 1 1) (1 1 1) );
blocks ( hex (0 1 2 3 4 5 6 7) (300 1 1) simpleGrading (1 1 1) );
boundary (
  low  { type patch; faces ((0 4 7 3)); }
  high { type patch; faces ((2 6 5 1)); }
  empty1 { type empty; faces ((1 5 4 0) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
""")
    with open(case + "/system/controlDict", "w") as f:
        f.write(HDR % ("dictionary", "controlDict") + f"""
application financialFoam; startFrom startTime; startTime 0;
stopAt endTime; endTime {tau}; deltaT 0.005;
writeControl timeStep; writeInterval 1000; writeFormat ascii;
""")
    with open(case + "/system/fvSchemes", "w") as f:
        f.write(HDR % ("dictionary", "fvSchemes") + """
ddtSchemes { default Euler; } gradSchemes { default Gauss linear; }
divSchemes { default none; div(phi,V) Gauss linear; }
laplacianSchemes { default Gauss linear orthogonal; }
interpolationSchemes { default linear; } snGradSchemes { default orthogonal; }
""")
    with open(case + "/system/fvSolution", "w") as f:
        f.write(HDR % ("dictionary", "fvSolution") + """
solvers { V { solver PBiCGStab; tolerance 1e-10; relTol 0; maxIter 500; } }
""")
    with open(case + "/constant/financialProperties", "w") as f:
        f.write(HDR % ("dictionary", "financialProperties")
                + f"sigma {sigma};\nr {r};\n")
    # payoff at tau=0 (expiry): max(S-K, 0); boundaries: V(1)~0,
    # V(150) ~ S - K e^{-r tau} -> use the tau-dependent value at end;
    # fixedValue at the final tau is a small boundary error far from K
    with open(case + "/0/V", "w") as f:
        import numpy as _np

        f.write(HDR % ("volScalarField", "V") + """
dimensions [0 0 0 0 0 0 0];
internalField nonuniform List<scalar>
300
(
""")
        S = 1.0 + (_np.arange(300) + 0.5) * (149.0 / 300.0)
        for s_ in S:
            f.write(f"{max(s_ - K, 0.0)}\n")
        f.write(f""")
;
boundaryField
{{
    low   {{ type fixedValue; value uniform 0; }}
    high  {{ type fixedValue; value uniform {150.0 - K * math.exp(-r * tau)}; }}
    empty1 {{ type empty; }}
}}
""")
    from foamtpu.apps.cli import main
    from foamtpu.core.case import run_case

    assert main(["blockMesh", "-case", case]) == 0
    c = run_case(case)
    V = np.asarray(c.final_state["V"].data)
    S = 1.0 + (np.arange(300) + 0.5) * (149.0 / 300.0)
    exact = np.array([_bs_call(s_, K, r, sigma, tau) for s_ in S])
    sel = (S > 25) & (S < 100)   # away from the far-field boundary
    err = np.abs(V[sel] - exact[sel])
    assert err.max() < 0.15, err.max()      # ~0.3% of K
    assert err.mean() < 0.05

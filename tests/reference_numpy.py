"""Independent NumPy oracles for golden-value tests.

These mirror the *math* of the reference implementation (sequential
kinematic loop, per-sample Rodrigues, naive LBS) in plain NumPy, written
directly from the MANO formulation. They are deliberately structured
differently from the production JAX code (loops instead of level-parallel
composition) so a bug in the vectorization cannot hide in both.
"""

import numpy as np

PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)
TIPS = (745, 317, 444, 556, 673)
NEW_ORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)


def np_rodrigues(axis):
    """Single axis-angle (3,) -> (3, 3), eps-regularised like the reference."""
    angle = np.linalg.norm(axis) + 1e-8
    u = axis / angle
    K = np.array(
        [[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def np_mano_forward(model, root_rot, pose_pca, shape, trans=None, scale=None,
                    center_idx=9):
    """Sequential-loop MANO forward. All inputs numpy, float64 internally.

    model: dict with v_template, shapedirs, posedirs, J_regressor, weights,
    hands_components, hands_mean (numpy arrays).
    """
    bs = root_rot.shape[0]
    v_template = model["v_template"].astype(np.float64)
    shapedirs = model["shapedirs"].astype(np.float64)
    posedirs = model["posedirs"].astype(np.float64)
    J_reg = model["J_regressor"].astype(np.float64)
    weights = model["weights"].astype(np.float64)
    comps = model["hands_components"].astype(np.float64)
    mean = model["hands_mean"].astype(np.float64)

    ncomps = pose_pca.shape[1]
    axis = pose_pca.astype(np.float64) @ comps[:ncomps] + mean  # (B, 45)

    verts_out = np.zeros((bs, v_template.shape[0], 3))
    joints_out = np.zeros((bs, 21, 3))
    for b in range(bs):
        R = np.stack([np_rodrigues(axis[b, 3 * i : 3 * i + 3]) for i in range(15)])
        v_shaped = v_template + shapedirs @ shape[b].astype(np.float64)
        j_tpose = J_reg @ v_shaped  # (16, 3)
        pose_feat = (R - np.eye(3)).reshape(135)
        v_tpose = v_shaped + posedirs @ pose_feat

        all_R = np.concatenate([root_rot[b][None].astype(np.float64), R])
        G = [None] * 16
        for i in range(16):
            A = np.eye(4)
            A[:3, :3] = all_R[i]
            A[:3, 3] = (np.eye(3) - all_R[i]) @ j_tpose[i]
            G[i] = A if i == 0 else G[PARENTS[i]] @ A

        j_posed = np.stack(
            [j_tpose[0]]
            + [(G[PARENTS[i]] @ np.append(j_tpose[i], 1.0))[:3] for i in range(1, 16)]
        )
        T = np.einsum("vj,jmn->vmn", weights, np.stack(G))
        v_out = np.einsum("vmn,vn->vm", T[:, :3, :3], v_tpose) + T[:, :3, 3]

        j21 = np.concatenate([j_posed, v_out[list(TIPS)]])[list(NEW_ORDER)]

        if center_idx is not None:
            c = j21[center_idx : center_idx + 1]
            v_out = v_out - c
            j21 = j21 - c
        if scale is not None:
            v_out = v_out * scale[b]
            j21 = j21 * scale[b]
        if trans is not None:
            v_out = v_out + trans[b]
            j21 = j21 + trans[b]
        verts_out[b] = v_out
        joints_out[b] = j21
    return verts_out, joints_out


def np_similarity_align(S1, S2):
    """Per-sample Procrustes alignment oracle (S1, S2: (N, 3))."""
    S1, S2 = S1.T.astype(np.float64), S2.T.astype(np.float64)
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = (X1**2).sum()
    K = X1 @ X2.T
    U, _, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(3)
    Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
    R = V @ Z @ U.T
    s = np.trace(R @ K) / var1
    t = mu2 - s * (R @ mu1)
    return (s * R @ S1 + t).T

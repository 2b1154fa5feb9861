"""Least-squares RBF "sheet" fits of ridge surfaces
(reference hybdrt/mapping/sheet.py)."""
import numpy as np


def rbf_design_matrix(coords, centers, epsilon=1.0):
    coords = np.atleast_2d(coords)
    centers = np.atleast_2d(centers)
    d2 = np.sum((coords[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return np.exp(-(epsilon ** 2) * d2)


def fit_sheet(coords, values, centers=None, epsilon=1.0, ridge=1e-8):
    """Fit values(coords) with an RBF expansion; returns (coef, centers)."""
    coords = np.atleast_2d(np.asarray(coords, dtype=float))
    values = np.asarray(values, dtype=float)
    if centers is None:
        centers = coords
    a = rbf_design_matrix(coords, centers, epsilon)
    ata = a.T @ a + ridge * np.eye(a.shape[1])
    coef = np.linalg.solve(ata, a.T @ values)
    return coef, np.atleast_2d(centers)


def evaluate_sheet(coords, coef, centers, epsilon=1.0):
    return rbf_design_matrix(coords, centers, epsilon) @ coef


def optimize_sheets(ridge_coords_list, values_list, epsilon=1.0, ridge=1e-8):
    """Fit one RBF sheet per ridge trajectory (reference sheet.py:32)."""
    sheets = []
    for coords, values in zip(ridge_coords_list, values_list):
        coef, centers = fit_sheet(coords, values, epsilon=epsilon, ridge=ridge)
        sheets.append({"coef": coef, "centers": centers, "epsilon": epsilon})
    return sheets

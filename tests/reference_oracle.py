"""Independent float64 torch re-derivation of the reference MPPI algorithm.

This oracle is written from the algorithmic description in SURVEY.md §3.1
(derived from /root/reference/src/pi_mpc/mppi.py) — not copied — and exists
solely to validate numerical parity of the TPU solver: both implementations
receive the *same* externally generated noise tensor (the reference's torch
RNG stream cannot be reproduced in JAX, so the deterministic remainder of
the algorithm is compared instead; see SURVEY.md §7 "hard parts" #1).

Everything runs on CPU in float64 so the oracle is a strictly more precise
version of the computation.
"""

from __future__ import annotations

import math

import numpy as np
import torch
from scipy.optimize import brentq, minimize_scalar


class TorchOracleMPPI:
    """Reference-equivalent MPPI solve with injected noise (float64, CPU)."""

    def __init__(
        self,
        horizon,
        num_samples,
        dim_state,
        dim_control,
        dynamics,
        cost_func,
        u_min,
        u_max,
        sigmas,
        lambda_,
        lbps_delta=0.01,
        essps_target_ess=None,
        lambda_min=0.01,
        lambda_max=10.0,
        exploration=0.0,
        use_sg_filter=False,
        sg_window_size=5,
        sg_poly_order=3,
    ):
        self.horizon = horizon
        self.num_samples = num_samples
        self.dim_state = dim_state
        self.dim_control = dim_control
        self.dynamics = dynamics
        self.cost_func = cost_func
        self.u_min = torch.as_tensor(u_min, dtype=torch.float64)
        self.u_max = torch.as_tensor(u_max, dtype=torch.float64)
        self.sigmas = torch.as_tensor(sigmas, dtype=torch.float64)
        self.auto_lambda = lambda_ if isinstance(lambda_, str) else None
        self.lam = 1.0 if isinstance(lambda_, str) else float(lambda_)
        self.lbps_delta = lbps_delta
        self.target_ess = (
            essps_target_ess if essps_target_ess is not None else num_samples / 10
        )
        self.lambda_min = lambda_min
        self.lambda_max = lambda_max
        self.exploration = exploration
        self.use_sg_filter = use_sg_filter

        self.previous_action_seq = torch.zeros(horizon, dim_control, dtype=torch.float64)
        self.sg_history = torch.zeros(horizon - 1, dim_control, dtype=torch.float64)
        if use_sg_filter:
            half = (sg_window_size - 1) // 2
            idx = np.arange(-half, half + 1, dtype=np.float64)
            vander = np.vander(idx, N=sg_poly_order + 1, increasing=True)
            self.sg_coeffs = np.linalg.pinv(vander)[0]

        if self.auto_lambda == "MPO":
            self.log_temperature = torch.nn.Parameter(
                torch.log(torch.tensor([1.0], dtype=torch.float64))
            )
            self.optimizer = torch.optim.Adam([self.log_temperature], lr=0.2)

    # ------------------------------------------------------------------
    def _ess(self, weights: torch.Tensor) -> float:
        return float(1.0 / torch.sum(weights**2))

    def solve(self, state, noise, info=None):
        info = {} if info is None else dict(info)
        K, T, m = self.num_samples, self.horizon, self.dim_control
        state = torch.as_tensor(np.asarray(state), dtype=torch.float64)
        noise = torch.as_tensor(np.asarray(noise), dtype=torch.float64)
        assert noise.shape == (K, T, m)

        mean = self.previous_action_seq.clone()

        # sample split + clamp
        threshold = int(K * (1 - self.exploration))
        perturbed = torch.cat([mean.unsqueeze(0) + noise[:threshold], noise[threshold:]])
        perturbed = torch.max(torch.min(perturbed, self.u_max), self.u_min)

        # rollout
        states = torch.zeros(K, T + 1, self.dim_state, dtype=torch.float64)
        states[:, 0] = state.unsqueeze(0).expand(K, -1)
        for t in range(T):
            states[:, t + 1] = self.dynamics(states[:, t], perturbed[:, t])

        # stage costs
        costs = torch.zeros(K, T, dtype=torch.float64)
        initial_state = states[:, 0]
        for t in range(T):
            prev_index = t - 1 if t > 0 else 0
            info["prev_state"] = states[:, prev_index]
            info["prev_action"] = perturbed[:, prev_index]
            info["initial_state"] = initial_state
            info["t"] = t
            costs[:, t] = self.cost_func(states[:, t], perturbed[:, t], info)

        # terminal cost (prev_state second-to-last; t/prev_action stale)
        info["prev_state"] = states[:, -2]
        terminal = self.cost_func(
            states[:, -1], torch.zeros(K, m, dtype=torch.float64), info
        )
        total = costs.sum(dim=1) + terminal

        # auto lambda
        if self.auto_lambda == "LBPS":
            def objective(lam):
                w = torch.softmax(-total / lam, dim=0)
                ess = self._ess(w)
                expected_return = float(-torch.sum(w * total))
                cost_range = float(total.max() - total.min())
                penalty = (
                    cost_range
                    * math.sqrt((1 - self.lbps_delta) / self.lbps_delta)
                    / math.sqrt(ess)
                )
                return -(expected_return - penalty)

            self.lam = minimize_scalar(
                objective, bounds=(self.lambda_min, self.lambda_max), method="bounded"
            ).x
        elif self.auto_lambda == "ESSPS":
            ess_min = self._ess(torch.softmax(-total / self.lambda_min, dim=0))
            ess_max = self._ess(torch.softmax(-total / self.lambda_max, dim=0))
            if self.target_ess <= ess_min:
                self.lam = self.lambda_min
            elif self.target_ess >= ess_max:
                self.lam = self.lambda_max
            else:
                self.lam = brentq(
                    lambda lam: self._ess(torch.softmax(-total / lam, dim=0))
                    - self.target_ess,
                    self.lambda_min,
                    self.lambda_max,
                )

        weights = torch.softmax(-total / self.lam, dim=0)
        optimal = torch.sum(weights.view(K, 1, 1) * perturbed, dim=0)

        if self.auto_lambda == "MPO":
            self.optimizer.zero_grad()
            temperature = torch.nn.functional.softplus(self.log_temperature)
            lse = torch.logsumexp(-total.detach() / temperature, dim=0)
            loss = temperature * (0.1 + torch.mean(lse))
            loss.backward()
            self.optimizer.step()
            self.lam = float(torch.exp(self.log_temperature.detach()))

        if self.use_sg_filter:
            prolonged = torch.cat([self.sg_history, optimal], dim=0).numpy()
            pad = len(self.sg_coeffs) // 2
            filtered = np.zeros_like(prolonged)
            for dim in range(m):
                y = prolonged[:, dim]
                y_padded = np.concatenate([y[:pad][::-1], y, y[-pad:][::-1]])
                filtered[:, dim] = np.correlate(y_padded, self.sg_coeffs, mode="valid")
            optimal = torch.from_numpy(filtered[-T:])

        # nominal trajectory
        nominal = torch.zeros(T + 1, self.dim_state, dtype=torch.float64)
        nominal[0] = state
        for t in range(T):
            nominal[t + 1] = self.dynamics(
                nominal[t].unsqueeze(0), optimal[t].unsqueeze(0)
            )[0]

        self.previous_action_seq = optimal
        if T > 1:
            self.sg_history = torch.cat([self.sg_history[1:], optimal[:1]], dim=0)

        return optimal.numpy(), nominal.numpy(), weights.numpy(), float(self.lam)

"""Van der Pol nonlinear MPC example (parity: examples/vanderpol_ex.cpp).

2-state continuous-time Van der Pol oscillator regulated to the origin,
ph = 10, ch = 5, with the per-step input cap ``u <= 0.5`` as a user
inequality constraint; closed loop with explicit-Euler plant updates until
the state reaches the origin tolerance.
"""

import numpy as np

import jax.numpy as jnp

from libmpc_tpu import NLMPC, Logger, LogLevel, NLParameters


def main():
    num_states, num_inputs, num_output = 2, 1, 2
    pred_hor, ctrl_hor = 10, 5
    ineq_c, eq_c = pred_hor + 1, 0
    ts = 0.1

    controller = NLMPC(num_states, num_inputs, num_output,
                       pred_hor, ctrl_hor, ineq_c, eq_c)
    controller.set_logger_level(LogLevel.NONE)
    controller.set_discretization_sampling_time(ts)
    controller.set_optimizer_parameters(NLParameters(maximum_iteration=1000))

    def state_eq(x, u, k):
        return jnp.stack([
            (1.0 - x[1] * x[1]) * x[0] - x[1] + u[0],
            x[0],
        ])

    controller.set_state_space_function(state_eq)
    controller.set_objective_function(
        lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2)
    )
    controller.set_ineq_con_function(lambda X, Y, U, e: U[:, 0] - 0.5)

    model_x = np.array([0.0, 1.0])
    cmd = np.zeros(num_inputs)

    for step in range(500):
        res = controller.optimize(model_x, cmd)
        cmd = np.asarray(res.cmd)
        dx = np.asarray(state_eq(jnp.asarray(model_x), jnp.asarray(cmd), 0))
        model_x = model_x + dx * ts
        if abs(model_x[0]) <= 1e-2 and abs(model_x[1]) <= 1e-1:
            break

    print(f"converged in {step + 1} steps, final state {model_x}")
    print(controller.get_execution_stats())


if __name__ == "__main__":
    main()

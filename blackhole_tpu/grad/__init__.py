"""Gradient engines — pick by parameter count and backend.

+----------------------+--------------------------------------------+
| workload             | engine                                     |
+----------------------+--------------------------------------------+
| few params (<= ~10), | fast_grad.scene_value_and_grad /           |
| TPU                  | render_value_and_grad / inverse.fit_forward|
|                      | — ALL tangents in one multi-tangent Pallas |
|                      | pass; full early exit, no remat            |
| few params, any      | fast_grad.value_and_grad_fwd — one         |
| backend              | tangent-augmented call per parameter       |
| many params          | diff_trace (checkpointed-scan reverse) or  |
|                      | bucketed.grad_over_chunks (adds per-chunk  |
|                      | step-budget bucketing)                     |
| sharded              | parallel.mesh.loss_and_grad_sharded (psum  |
|                      | all-reduce of replicated-param grads)      |
+----------------------+--------------------------------------------+

A kernel-level reverse-mode VJP is deliberately NOT provided: the
forward multi-tangent path already covers every few-parameter workload
at ~1.5x forward cost, and a while_loop adjoint would need per-segment
VMEM checkpoints that don't fit alongside 32x128-ray tiles — the
checkpointed XLA scan is the right reverse engine on this hardware.
"""

# Intentionally empty: import op modules directly (merv_tpu.ops.attention,
# merv_tpu.ops.ring_attention). Re-exporting the `attention`/`ring_attention`
# FUNCTIONS here would shadow the same-named SUBMODULES on the package object
# (`import merv_tpu.ops.attention as A` resolves the attribute first), which
# breaks monkeypatching and module-qualified access.

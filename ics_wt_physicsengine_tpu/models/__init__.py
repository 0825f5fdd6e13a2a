"""Assembled plant models: integrated plant (physics + sensors) and
Monte-Carlo batches, plus the named BASELINE configurations."""

from ics_wt_physicsengine_tpu.models.monte_carlo import (  # noqa: F401
    ParameterRanges,
    make_monte_carlo_batch,
)
from ics_wt_physicsengine_tpu.models.plant import (  # noqa: F401
    PlantParams,
    PlantState,
    config1_two_zone,
    config2_stratified_20_zone,
    config3_full_sensors,
    config4_monte_carlo,
    config5_hil_cli_args,
    make_plant,
    make_plant_batch,
    plant_rollout,
    plant_rollout_batched,
    plant_rollout_scheduled,
    plant_step,
    plant_step_batched,
)
from ics_wt_physicsengine_tpu.models.surrogate import (  # noqa: F401
    SurrogateParams,
    fit_plant_surrogate,
    make_surrogate_dataset,
    run_mpc_surrogate,
    surrogate_mpc_plan,
    surrogate_rollout,
    surrogate_step,
    train_surrogate,
)

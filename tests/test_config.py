"""Config round-trips: YAML <-> dataclasses incl. tagged unions.

Counterpart of the reference config tests (reference: tests/
test_config.py): the ``__config_class__`` tag selects the weighting
class exactly like the reference YAML format, and invalid documents
raise typed errors.
"""

import pytest
import yaml

from neural_lam_tpu.config import (
    DatastoreSelection,
    InvalidConfigError,
    ManualStateFeatureWeighting,
    NeuralLAMConfig,
    OutputClamping,
    TrainingConfig,
    UniformFeatureWeighting,
    config_from_dict,
    config_to_dict,
    load_config,
)

FULL_DOC = {
    "datastore": {"kind": "mdp", "config_path": "danra.datastore.yaml"},
    "training": {
        "state_feature_weighting": {
            "__config_class__": "ManualStateFeatureWeighting",
            "weights": {"u100m": 1.0, "v100m": 2.0},
        },
        "output_clamping": {
            "lower": {"r2m": 0.0},
            "upper": {"r2m": 1.0},
        },
    },
}


def test_full_document_round_trip():
    cfg = config_from_dict(FULL_DOC)
    assert cfg.datastore.kind == "mdp"
    assert isinstance(
        cfg.training.state_feature_weighting, ManualStateFeatureWeighting
    )
    assert cfg.training.state_feature_weighting.weights["v100m"] == 2.0
    assert cfg.training.output_clamping.lower == {"r2m": 0.0}

    out = config_to_dict(cfg)
    # loader(serialiser(cfg)) is identity
    cfg2 = config_from_dict(out)
    assert cfg2 == cfg


def test_defaults_when_training_absent():
    cfg = config_from_dict(
        {"datastore": {"kind": "dummydata", "config_path": ""}}
    )
    assert isinstance(
        cfg.training.state_feature_weighting, UniformFeatureWeighting
    )
    assert cfg.training.output_clamping == OutputClamping()
    # defaults survive serialisation
    assert config_from_dict(config_to_dict(cfg)) == cfg


def test_yaml_file_round_trip(tmp_path):
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(FULL_DOC), encoding="utf-8")
    cfg = load_config(path)
    assert config_from_dict(config_to_dict(cfg)) == cfg

    # a serialised config parses as a valid YAML document again
    path2 = tmp_path / "rt.yaml"
    path2.write_text(
        yaml.safe_dump(config_to_dict(cfg)), encoding="utf-8"
    )
    assert load_config(path2) == cfg


def test_uniform_weighting_tag():
    cfg = config_from_dict(
        {
            "datastore": {"kind": "mdp", "config_path": "x.yaml"},
            "training": {
                "state_feature_weighting": {
                    "__config_class__": "UniformFeatureWeighting"
                }
            },
        }
    )
    assert isinstance(
        cfg.training.state_feature_weighting, UniformFeatureWeighting
    )


@pytest.mark.parametrize(
    "doc,match",
    [
        ({}, "datastore"),
        ({"datastore": {"kind": "mdp"}}, "datastore"),
        (
            {
                "datastore": {"kind": "mdp", "config_path": "x"},
                "training": {"bogus_key": 1},
            },
            "Unknown keys",
        ),
        (
            {
                "datastore": {"kind": "mdp", "config_path": "x"},
                "training": {
                    "state_feature_weighting": {
                        "__config_class__": "NoSuchWeighting"
                    }
                },
            },
            "NoSuchWeighting",
        ),
        (
            {
                "datastore": {"kind": "mdp", "config_path": "x"},
                "training": {
                    "output_clamping": {"lower_lims": {"t2m": 230}}
                },
            },
            "output_clamping",
        ),
        (
            {
                "datastore": {"kind": "mdp", "config_path": "x"},
                "training": {
                    "state_feature_weighting": {
                        "__config_class__": "UniformFeatureWeighting",
                        "stray_key": 1,
                    }
                },
            },
            "state_feature_weighting",
        ),
    ],
)
def test_invalid_documents_raise(doc, match):
    with pytest.raises(InvalidConfigError, match=match):
        config_from_dict(doc)


def test_dataclass_construction_matches_dict_parsing():
    built = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="mdp", config_path="d.yaml"),
        training=TrainingConfig(
            state_feature_weighting=ManualStateFeatureWeighting(
                weights={"a": 1.0}
            ),
            output_clamping=OutputClamping(lower={"a": 0.0}),
        ),
    )
    parsed = config_from_dict(config_to_dict(built))
    assert parsed == built

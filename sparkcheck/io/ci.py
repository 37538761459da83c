"""CI workflow emitters — write a ready-to-run pipeline that executes
``sparkcheck validate`` + report rendering and uploads the artifacts.

Analog of the reference's CI/CD providers (sql_testing/
ci_cd_integration.py:144-413: GitHubActionsProvider, GitLabCIProvider,
JenkinsProvider). The reference emitted `sqltest ci` commands; here the
pipeline step is the sparkcheck CLI — a validate run producing JSON +
HTML + JUnit-style history, on a local[*] Spark that needs nothing but
Java + pip.

Emitters build plain dicts and serialize with yaml.safe_dump, so the
output is always syntactically valid YAML (asserted in tests).
"""

from __future__ import annotations

import yaml

_VALIDATE_CMD = (
    "python -m sparkcheck validate --table {table} --rules {rules} "
    "--out report.json --html report.html --csv outcomes.csv "
    "--history history.jsonl"
)


def _cmd(table: str, rules: str) -> str:
    return _VALIDATE_CMD.format(table=table, rules=rules)


def github_actions_workflow(
    project: str = "sparkcheck",
    table: str = "data/table.parquet",
    rules: str = "rules.yaml",
    python_version: str = "3.11",
    branches: list[str] | None = None,
    timeout_minutes: int = 30,
) -> str:
    """GitHub Actions workflow YAML (reference ci_cd_integration.py:
    147-195 shape, re-targeted at the Spark CLI)."""
    branches = branches or ["main"]
    workflow = {
        "name": f"sparkcheck — {project}",
        "on": {
            "push": {"branches": branches},
            "pull_request": {"branches": branches},
        },
        "jobs": {
            "validate": {
                "runs-on": "ubuntu-latest",
                "timeout-minutes": timeout_minutes,
                "steps": [
                    {"name": "Checkout", "uses": "actions/checkout@v4"},
                    {
                        "name": "Set up Python",
                        "uses": "actions/setup-python@v5",
                        "with": {"python-version": python_version},
                    },
                    {
                        "name": "Set up Java",
                        "uses": "actions/setup-java@v4",
                        "with": {"distribution": "temurin", "java-version": "17"},
                    },
                    {
                        "name": "Install dependencies",
                        "run": "pip install pyspark pyarrow pandas pyyaml",
                    },
                    {"name": "Run sparkcheck", "run": _cmd(table, rules)},
                    {
                        "name": "Upload validation artifacts",
                        "uses": "actions/upload-artifact@v4",
                        "if": "always()",
                        "with": {
                            "name": "sparkcheck-report",
                            "path": "report.json\nreport.html\noutcomes.csv",
                        },
                    },
                ],
            }
        },
    }
    return yaml.safe_dump(workflow, default_flow_style=False, sort_keys=False)


def gitlab_ci_pipeline(
    table: str = "data/table.parquet",
    rules: str = "rules.yaml",
    python_version: str = "3.11",
) -> str:
    """GitLab CI YAML (reference ci_cd_integration.py:256-318 shape)."""
    pipeline = {
        "stages": ["validate"],
        "sparkcheck-validate": {
            "stage": "validate",
            "image": f"python:{python_version}",
            "before_script": [
                "apt-get update && apt-get install -y default-jre-headless",
                "pip install pyspark pyarrow pandas pyyaml",
            ],
            "script": [_cmd(table, rules)],
            "artifacts": {
                "when": "always",
                "paths": ["report.json", "report.html", "outcomes.csv"],
            },
        },
    }
    return yaml.safe_dump(pipeline, default_flow_style=False, sort_keys=False)


def jenkins_pipeline(
    table: str = "data/table.parquet",
    rules: str = "rules.yaml",
) -> str:
    """Declarative Jenkinsfile (reference ci_cd_integration.py:322-413
    shape — text template, not YAML)."""
    cmd = _cmd(table, rules)
    return f"""pipeline {{
    agent any
    stages {{
        stage('Validate') {{
            steps {{
                sh 'pip install pyspark pyarrow pandas pyyaml'
                sh '{cmd}'
            }}
        }}
    }}
    post {{
        always {{
            archiveArtifacts artifacts: 'report.json, report.html, outcomes.csv',
                             allowEmptyArchive: true
        }}
    }}
}}
"""


EMITTERS = {
    "github": github_actions_workflow,
    "gitlab": gitlab_ci_pipeline,
    "jenkins": jenkins_pipeline,
}

DEFAULT_PATHS = {
    "github": ".github/workflows/sparkcheck.yml",
    "gitlab": ".gitlab-ci.yml",
    "jenkins": "Jenkinsfile",
}

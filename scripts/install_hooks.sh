#!/bin/bash
# Install the repo's git hooks (git doesn't track .git/hooks).
# Run once per clone: bash scripts/install_hooks.sh
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/bash
exec bash scripts/precommit_gate.sh
EOF
chmod +x .git/hooks/pre-commit scripts/precommit_gate.sh
echo "installed: .git/hooks/pre-commit -> scripts/precommit_gate.sh"

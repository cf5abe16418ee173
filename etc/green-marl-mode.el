;;; green-marl-mode.el --- Green-Marl (.gm) major mode (original,
;;; analog of the reference's editor support; keyword tables from this
;;; repo's lang/lexer.py).
(defvar green-marl-font-lock
  `((,(regexp-opt '("Procedure" "Proc" "Local" "If" "Else" "While" "Do"
                    "For" "Foreach" "Return" "InBFS" "InRBFS" "InDFS"
                    "InPost" "InReverse" "From" "Navigator") 'words)
     . font-lock-keyword-face)
    (,(regexp-opt '("Graph" "DGraph" "UGraph" "Node" "Edge" "Int" "Long"
                    "Float" "Double" "Bool" "N_P" "E_P" "Node_Property"
                    "Edge_Property" "N_S" "N_O" "N_Q" "Node_Set"
                    "Node_Order" "Node_Seq" "Map") 'words)
     . font-lock-type-face)
    (,(regexp-opt '("Sum" "Product" "Count" "Min" "Max" "Avg" "All"
                    "Any" "Exist") 'words)
     . font-lock-function-name-face)
    (,(regexp-opt '("True" "False" "NIL" "INF") 'words)
     . font-lock-constant-face)
    ("\\$[A-Za-z_][A-Za-z0-9_]*" . font-lock-variable-name-face)))

(define-derived-mode green-marl-mode c-mode "Green-Marl"
  "Major mode for Green-Marl DSL files."
  (setq font-lock-defaults '(green-marl-font-lock)))

(add-to-list 'auto-mode-alist '("\\.gm\\'" . green-marl-mode))
(provide 'green-marl-mode)

" Vim syntax for Green-Marl (.gm) — original file for green_marl_tpu
" (analog of the reference's editor support under etc/; written from
" this repo's own lexer/grammar tables, lang/lexer.py + lang/parser.py).
"
" Install:  cp etc/gm.vim ~/.vim/syntax/  and add
"           au BufRead,BufNewFile *.gm set filetype=gm
if exists("b:current_syntax")
  finish
endif

syn case match

" ---- keywords (lang/lexer.py keyword table) -------------------------
syn keyword gmProc      Procedure Proc Local
syn keyword gmCtrl      If Else While Do For Foreach Return
syn keyword gmBfs       InBFS InRBFS InDFS InPost InReverse From Navigator
syn keyword gmIter      Nodes Edges Nbrs InNbrs OutNbrs UpNbrs DownNbrs
syn keyword gmIter      CommonNbrs Items
syn keyword gmType      Graph DGraph UGraph Node Edge Int Long Float
syn keyword gmType      Double Bool N_P E_P Node_Property Edge_Property
syn keyword gmType      N_S N_O N_Q Node_Set Node_Order Node_Seq Map
syn keyword gmReduce    Sum Product Count Min Max Avg All Any Exist
syn keyword gmConst     True False NIL INF
syn keyword gmBuiltin   NumNodes NumEdges PickRandom Uniform Rand
syn keyword gmBuiltin   Degree InDegree NumNbrs HasEdgeTo IsNbrFrom
syn keyword gmBuiltin   ToEdge FromNode ToNode Size Has Remove Clear
syn keyword gmBuiltin   Add AddBack AddFront Pop PopBack PopFront
syn keyword gmBuiltin   Push PushBack PushFront GetMinKey GetMaxKey
syn keyword gmBuiltin   HasMinValue HasMaxValue Log Exp Sqrt Pow Abs

" ---- operators / reduce-assigns ------------------------------------
syn match gmReduceOp    "+=\|\*=\|&&=\|||=\|min=\|max=\|++"
syn match gmOperator    "[-+*/%<>=!&|^~?:]"

" ---- numbers, strings ----------------------------------------------
syn match gmNumber      "\<\d\+\(\.\d*\)\=\([eE][-+]\=\d\+\)\=\>"
syn region gmString     start=+"+ skip=+\\"+ end=+"+

" ---- comments ------------------------------------------------------
syn match gmComment     "//.*$"
syn region gmComment    start="/\*" end="\*/"

" ---- foreign escape ------------------------------------------------
syn region gmForeign    start="\[" end="\]" contains=gmForeignRef
syn match gmForeignRef  "\$[A-Za-z_][A-Za-z0-9_]*" contained

hi def link gmProc      Keyword
hi def link gmCtrl      Conditional
hi def link gmBfs       Repeat
hi def link gmIter      Identifier
hi def link gmType      Type
hi def link gmReduce    Function
hi def link gmConst     Constant
hi def link gmBuiltin   Function
hi def link gmReduceOp  Operator
hi def link gmOperator  Operator
hi def link gmNumber    Number
hi def link gmString    String
hi def link gmComment   Comment
hi def link gmForeign   Special
hi def link gmForeignRef Identifier

let b:current_syntax = "gm"

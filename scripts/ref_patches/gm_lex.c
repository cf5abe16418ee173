/*
 * Hand-written replacement for the flex-generated scanner (gm_lex.l).
 * The build environment has no flex; this implements the same external
 * interface: yylex(), yyin, lex_lines, GM_start_parse(),
 * GM_print_parse_error(), yyerror(), GM_lex_begin_user_text(),
 * GM_get_empty_lines().  Token codes come from gm_grammer.tab.h.
 */
#include <assert.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "gm_frontend_api.h"
#include "gm_grammer.tab.h"

FILE* yyin = NULL;
int lex_lines = 1;
static int empty_lines = 0;
int GM_get_empty_lines() { return empty_lines; }

extern YYSTYPE yylval;
extern YYLTYPE yylloc;
void yyerror(const char* str);

#define MAX_LINE 2048
static char line_buffer[MAX_LINE];
static char file_name[MAX_LINE];
static int is_eof = 0;
static int curr_line = 0;
static int buf_len = 0;
static int buf_ptr = 0;
static int token_begin = 0, token_len = 0, token_begin_next = 0;
static int line_had_token = 0;   /* for ^[ \t\r]*\n empty-line rule */
static int user_text_mode = 0;
static int bracket_count = 0;

#define USER_TEXT_MAX (4 * 1024 * 1024 + 1)
static char user_text_buf[USER_TEXT_MAX];
static int user_text_cnt = 0;

#define TOK_MAX 4096
static char tok_buf[TOK_MAX];

int GM_start_parse(char* fname)
{
    yyin = fopen(fname, "r");
    if (yyin == NULL) return 0;
    strcpy(file_name, fname);
    is_eof = 0;
    curr_line = 0;
    buf_len = 0;
    buf_ptr = 0;
    token_begin_next = 0;
    token_begin = 0;
    token_len = 0;
    lex_lines = 1;
    empty_lines = 0;
    line_had_token = 0;
    user_text_mode = 0;
    bracket_count = 0;
    user_text_cnt = 0;
    return 1;
}

static int fill_line(void)
{
    /* returns 0 ok, 1 eof */
    if (is_eof) return 1;
    char* p = fgets(line_buffer, MAX_LINE, yyin);
    if (p == NULL) {
        buf_len = 0;
        buf_ptr = 0;
        fclose(yyin);
        is_eof = 1;
        return 1;
    }
    curr_line++;
    buf_len = (int)strlen(line_buffer);
    buf_ptr = 0;
    return 0;
}

static int peekc(int off)
{
    /* look at buf_ptr+off within current line; -1 past end of line */
    if (buf_ptr + off >= buf_len) return -1;
    return (unsigned char)line_buffer[buf_ptr + off];
}

static int curc(void)
{
    while (buf_ptr >= buf_len) {
        if (fill_line()) return -1;
    }
    return (unsigned char)line_buffer[buf_ptr];
}

static void mark_token(int len)
{
    token_begin = buf_ptr;
    token_len = len;
    token_begin_next = buf_ptr + 1;
    yylloc.first_line = curr_line;
    yylloc.first_column = token_begin;
    line_had_token = 1;
}

void GM_lex_begin_user_text(void)
{
    user_text_mode = 1;
    bracket_count = 0;
    user_text_cnt = 0;
    mark_token(0);
}

static void save_user_text(char c)
{
    assert(user_text_cnt < USER_TEXT_MAX);
    user_text_buf[user_text_cnt++] = c;
}

typedef struct { const char* kw; int tok; } kw_t;
/* alphanumeric keywords (matched after identifier scan) */
static const kw_t keywords[] = {
    {"Local", T_LOCAL}, {"Procedure", T_PROC}, {"Proc", T_PROC},
    {"InBFS", T_BFS}, {"InDFS", T_DFS}, {"InPost", T_POST},
    {"InRBFS", T_RBFS}, {"From", T_FROM}, {"To", T_TO},
    {"InReverse", T_BACK}, {"Graph", T_GRAPH}, {"Node", T_NODE},
    {"Edge", T_EDGE}, {"Node_Property", T_NODEPROP},
    {"Node_Prop", T_NODEPROP}, {"N_P", T_NODEPROP},
    {"Edge_Property", T_EDGEPROP}, {"Edge_Prop", T_EDGEPROP},
    {"E_P", T_EDGEPROP}, {"Node_Set", T_NSET}, {"N_S", T_NSET},
    {"Node_Order", T_NORDER}, {"N_O", T_NORDER},
    {"Node_Seq", T_NSEQ}, {"Node_Sequence", T_NSEQ}, {"N_Q", T_NSEQ},
    {"Collection", T_COLLECTION}, {"Map", T_MAP}, {"Int", T_INT},
    {"Long", T_LONG}, {"Float", T_FLOAT}, {"Double", T_DOUBLE},
    {"Bool", T_BOOL}, {"Nodes", T_NODES}, {"Edges", T_EDGES},
    {"Nbrs", T_NBRS}, {"OutNbrs", T_NBRS}, {"InNbrs", T_IN_NBRS},
    {"UpNbrs", T_UP_NBRS}, {"DownNbrs", T_DOWN_NBRS},
    {"Items", T_ITEMS}, {"CommonNbrs", T_COMMON_NBRS},
    {"Foreach", T_FOREACH}, {"For", T_FOR}, {"And", T_AND},
    {"Or", T_OR}, {"If", T_IF}, {"Else", T_ELSE}, {"While", T_WHILE},
    {"Return", T_RETURN}, {"Do", T_DO}, {"Sum", T_SUM}, {"Avg", T_AVG},
    {"Count", T_COUNT}, {"Product", T_PRODUCT}, {"Max", T_MAX},
    {"Min", T_MIN}, {"INF", T_P_INF}, {"All", T_ALL},
    {"Exist", T_EXIST}, {"NIL", T_NIL},
    {NULL, 0}
};

int yylex(void)
{
    if (user_text_mode) {
        for (;;) {
            int c = curc();
            if (c < 0) return 0; /* eof inside user text */
            if (c == '\n') { lex_lines++; save_user_text((char)c); buf_ptr++; continue; }
            if (c == '[') { bracket_count++; save_user_text((char)c); buf_ptr++; continue; }
            if (c == ']') {
                if (bracket_count == 0) {
                    /* leave ']' unconsumed; INITIAL mode returns it next */
                    user_text_mode = 0;
                    assert(user_text_cnt < USER_TEXT_MAX);
                    user_text_buf[user_text_cnt++] = '\0';
                    yylval.text = user_text_buf;
                    user_text_cnt = 0;
                    return USER_TEXT;
                }
                bracket_count--;
                save_user_text((char)c);
                buf_ptr++;
                continue;
            }
            save_user_text((char)c);
            buf_ptr++;
        }
    }

    for (;;) {
        int c = curc();
        if (c < 0) return 0; /* EOF */

        /* newline: empty-line bookkeeping (flex rules ^[ \t\r]*\n vs \n) */
        if (c == '\n') {
            int i, only_ws = 1;
            for (i = 0; i < buf_ptr; i++) {
                char ch = line_buffer[i];
                if (ch != ' ' && ch != '\t' && ch != '\r') { only_ws = 0; break; }
            }
            if (only_ws) empty_lines++;
            else empty_lines = 0;
            lex_lines++;
            buf_ptr++;
            continue;
        }
        if (c == ' ' || c == '\t' || c == '\r') { buf_ptr++; continue; }

        /* comments */
        if (c == '/' && peekc(1) == '/') { buf_ptr = buf_len; continue; }
        if (c == '/' && peekc(1) == '*') {
            buf_ptr += 2;
            for (;;) {
                int d = curc();
                if (d < 0) return 0;
                if (d == '\n') { lex_lines++; buf_ptr++; continue; }
                if (d == '*' && peekc(1) == '/') { buf_ptr += 2; break; }
                buf_ptr++;
            }
            continue;
        }

        /* identifiers / keywords */
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
            int len = 1;
            int d;
            while ((d = peekc(len)) >= 0 &&
                   ((d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
                    (d >= '0' && d <= '9') || d == '_'))
                len++;
            if (len >= TOK_MAX) len = TOK_MAX - 1;
            memcpy(tok_buf, line_buffer + buf_ptr, len);
            tok_buf[len] = '\0';
            mark_token(len);
            /* longest-match quirks: "min=", "max=" */
            if (peekc(len) == '=' &&
                (strcmp(tok_buf, "min") == 0 || strcmp(tok_buf, "max") == 0)) {
                int tok = (tok_buf[1] == 'i') ? T_MINEQ : T_MAXEQ;
                token_len = len + 1;
                buf_ptr += len + 1;
                return tok;
            }
            buf_ptr += len;
            if (strcmp(tok_buf, "True") == 0) { yylval.bval = 1; return BOOL_VAL; }
            if (strcmp(tok_buf, "False") == 0) { yylval.bval = 0; return BOOL_VAL; }
            {
                const kw_t* k;
                for (k = keywords; k->kw; k++)
                    if (strcmp(k->kw, tok_buf) == 0) return k->tok;
            }
            yylval.text = tok_buf;
            return ID;
        }

        /* numbers */
        if (c >= '0' && c <= '9') {
            int len = 1, d, isf = 0;
            while ((d = peekc(len)) >= 0 && d >= '0' && d <= '9') len++;
            if (peekc(len) == '.') {
                int l2 = len + 1;
                isf = 1;
                while ((d = peekc(l2)) >= 0 && d >= '0' && d <= '9') l2++;
                len = l2;
            }
            if (len >= TOK_MAX) len = TOK_MAX - 1;
            memcpy(tok_buf, line_buffer + buf_ptr, len);
            tok_buf[len] = '\0';
            mark_token(len);
            buf_ptr += len;
            if (isf) { yylval.fval = atof(tok_buf); return FLOAT_NUM; }
            yylval.ival = atoi(tok_buf); return INT_NUM;
        }

        /* multi-char operators ("+INF"/"-INF" first: longest match) */
        if ((c == '+' || c == '-') && peekc(1) == 'I' && peekc(2) == 'N' &&
            peekc(3) == 'F') {
            int after = peekc(4);
            int is_word = (after >= 'a' && after <= 'z') ||
                          (after >= 'A' && after <= 'Z') ||
                          (after >= '0' && after <= '9') || after == '_';
            if (!is_word) {
                mark_token(4);
                buf_ptr += 4;
                return (c == '+') ? T_P_INF : T_M_INF;
            }
        }
        {
            static const kw_t ops2[] = {
                {"&&", T_AND}, {"||", T_OR}, {"==", T_EQ}, {"!=", T_NEQ},
                {"<=", T_LE}, {">=", T_GE}, {"+=", T_PLUSEQ},
                {"++", T_PLUSPLUS}, {"--", T_MINUSMINUS}, {"*=", T_MULTEQ},
                {"&=", T_ANDEQ}, {"|=", T_OREQ}, {"::", T_DOUBLE_COLON},
                {"->", T_RARROW}, {NULL, 0}
            };
            const kw_t* k;
            int n1 = peekc(1);
            for (k = ops2; k->kw; k++) {
                if (c == (unsigned char)k->kw[0] && n1 == (unsigned char)k->kw[1]) {
                    mark_token(2);
                    buf_ptr += 2;
                    return k->tok;
                }
            }
        }

        /* any other single character */
        mark_token(1);
        buf_ptr++;
        return c;
    }
}

void GM_print_parse_error(const char* err_msg)
{
    printf("%s:%d:%d:", file_name, curr_line, token_begin);
    printf(" error: %s ", err_msg);
    if (token_len > 0) {
        printf("(near '");
        int i;
        for (i = token_begin; i < token_begin + token_len && i < buf_len; i++) {
            if (line_buffer[i] == '\n')
                printf("end-of-line");
            else
                printf("%c", line_buffer[i]);
        }
        printf("')");
    }
    printf("\n");
    GM_set_parse_error(true);
}

void yyerror(const char* str) { GM_print_parse_error(str); }
